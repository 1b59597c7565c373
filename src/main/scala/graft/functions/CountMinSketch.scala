package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as a typed `Aggregator`: a depth×width counter
  * matrix, one row per independent hash, updated at `bucket(key, d)`
  * per input and merged by elementwise addition — fully associative
  * and commutative, so the estimate is independent of partitioning and
  * merge order (unlike Misra-Gries, whose summary is order-dependent).
  *
  * `est(key) = min_d counters[d][bucket(key, d)]` never undercounts and
  * overcounts only by colliding keys' mass — the classic ≤ εN w.h.p.
  * bound. At 100 TB this answers per-key frequency queries with O(d·w)
  * state per task and an O(d·w) shuffle, no groupBy over the key
  * space, and sketches of disjoint shards union by addition — the same
  * mergeable-sketch-table shape as the HLL operator.
  *
  * The hash is the engine-portable md5 recipe used across this repo
  * (first 8 hex digits as an int): with fixed hashes the whole sketch
  * is deterministic, so the DuckDB oracle replays bucket sums exactly
  * and the estimate is hash-checkable, not just bounds-checkable.
  * (Production would swap in xxhash64 and a thread-local digest; md5
  * per update is the price of cross-engine replay here.)
  */
object CountMinSketch {

  def bucket(key: String, d: Int, width: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$key:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % width).toInt
  }

  def aggregator(depth: Int, width: Int): Aggregator[String, Array[Long], Seq[Long]] =
    new Aggregator[String, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = new Array[Long](depth * width)

      override def reduce(b: Array[Long], key: String): Array[Long] = {
        if (key != null) {
          var d = 0
          while (d < depth) {
            b(d * width + bucket(key, d, width)) += 1L
            d += 1
          }
        }
        b
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }

      override def finish(b: Array[Long]): Seq[Long] = b.toSeq

      override def bufferEncoder: Encoder[Array[Long]] =
        Encoders.kryo[Array[Long]]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
}
