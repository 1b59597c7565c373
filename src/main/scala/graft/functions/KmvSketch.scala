package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k minimum values) sketch as typed `Aggregator`s — the
  * distinct-count + uniform-sample member of the repo's mergeable-sketch
  * family (HLL table, Misra-Gries, count-min, theta, bitmap).
  *
  * Principle (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM'02; the θ-sketch's ancestor): hash every item into a
  * uniform domain H and keep only the k SMALLEST distinct hash values.
  * The k-th smallest kept value h_k estimates distinct count as
  * (k−1)·|H| / h_k, and because the hash order is a uniform random
  * permutation of the distinct items, the kept set is also a uniform
  * k-sample WITHOUT replacement of the distinct items — one sketch
  * serves cardinality AND order statistics (sample quantiles).
  *
  * Why it's exactly oracle-checkable where most sketches aren't: the
  * sketch state is a pure function of the item SET and k (bottom-k of a
  * deterministic hash), independent of merge order — so DuckDB can
  * replay it with a rank-over-hash window and every output digit
  * matches. Merge of two sketches = bottom-k of the union, which is why
  * map-side partial aggregation (and any per-source / per-day partial
  * sketch table) composes losslessly; `SketchSpec` pins merge-order
  * independence.
  *
  * At 100 TB: O(k) state per group per task, an O(k) shuffle per group,
  * never a key-space shuffle — the same reason Misra-Gries scales, now
  * for distinct counts and quantiles.
  *
  * Buffers are SORTED ArrayBuffers (insertion by binary search): kryo
  * round-trips them (a TreeSet/TreeMap buffer fails Spark's kryo
  * decode — the ordering isn't restored), inserts into a
  * 63-element buffer are cheap, and the gate `h < buffer.last` makes
  * post-saturation inserts rare on uniform hashes.
  */
object KmvSketch {

  /** Index of h in the ascending buffer keyed by `key`, or
    * (-insertionPoint - 1) — java.util.Arrays.binarySearch convention. */
  private def search(b: mutable.ArrayBuffer[Long], h: Long): Int = {
    var lo = 0; var hi = b.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = b(mid)
      if (v < h) lo = mid + 1
      else if (v > h) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  /** Distinct-count face: the k smallest DISTINCT hash values,
    * ascending. Estimator and k-th value are read off the array by the
    * consumer (`Profiling.kmvSketchTable`). */
  def distinctAgg(k: Int): Aggregator[Long, mutable.ArrayBuffer[Long], Seq[Long]] =
    new Aggregator[Long, mutable.ArrayBuffer[Long], Seq[Long]] {
      override def zero: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty

      private def add(b: mutable.ArrayBuffer[Long], h: Long): Unit =
        if (b.isEmpty || b.length < k || h < b.last) {
          val i = search(b, h)
          if (i < 0) {
            b.insert(-i - 1, h)
            if (b.length > k) b.remove(b.length - 1)
          }
        }

      override def reduce(b: mutable.ArrayBuffer[Long], h: Long): mutable.ArrayBuffer[Long] = {
        add(b, h); b
      }

      override def merge(a: mutable.ArrayBuffer[Long],
          b: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
        b.foreach(add(a, _)); a
      }

      override def finish(b: mutable.ArrayBuffer[Long]): Seq[Long] = b.toSeq

      override def bufferEncoder: Encoder[mutable.ArrayBuffer[Long]] =
        Encoders.kryo[mutable.ArrayBuffer[Long]]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Uniform-sample face: (hash, payload) pairs, bottom-k by hash,
    * kept as parallel hash/payload buffers sorted by hash; a
    * duplicated hash keeps the MIN payload so the sketch stays a pure
    * function of the input set under any merge order (hash collisions
    * across distinct rows are ~n²/2⁴⁹-rare but must not make the
    * result order-dependent). `finish` returns the kept payloads
    * sorted ASCENDING — ready for order statistics. */
  def sampleAgg(k: Int): Aggregator[(Long, Long),
      (mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long]), Seq[Long]] =
    new Aggregator[(Long, Long),
        (mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long]), Seq[Long]] {
      override def zero = (mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty)

      private def add(b: (mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long]),
          h: Long, v: Long): Unit = {
        val (hs, vs) = b
        val i = search(hs, h)
        if (i >= 0) { if (v < vs(i)) vs(i) = v }
        else if (hs.length < k || h < hs.last) {
          val at = -i - 1
          hs.insert(at, h); vs.insert(at, v)
          if (hs.length > k) { hs.remove(hs.length - 1); vs.remove(vs.length - 1) }
        }
      }

      override def reduce(b: (mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long]),
          in: (Long, Long)) = { add(b, in._1, in._2); b }

      override def merge(a: (mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long]),
          b: (mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long])) = {
        var i = 0
        while (i < b._1.length) { add(a, b._1(i), b._2(i)); i += 1 }
        a
      }

      override def finish(
          b: (mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long])): Seq[Long] =
        b._2.toSeq.sorted

      override def bufferEncoder:
          Encoder[(mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long])] =
        Encoders.kryo[(mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long])]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
}
