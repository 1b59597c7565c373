package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Mergeable EXACT-distinct bitmap over a bounded integer id domain —
  * the bitmap-index aggregation (ClickHouse/Doris `groupBitmap`,
  * roaring-bitmap family): one bit per id, `reduce` is a bit set,
  * `merge` a word-wise OR, both associative and commutative, so the
  * aggregate is partial-agg friendly and partitioning-independent like
  * the HLL/CMS/MG sketches — but EXACT, and closed under the full set
  * algebra (AND/OR/ANDNOT on the word arrays), which approximate
  * sketches only estimate. ~190 KB per group at 1.5 M ids; the buffer
  * grows to the highest id actually seen, so sparse groups stay small.
  * (A production bitmap compresses runs — roaring — but the aggregation
  * algebra is identical.)
  */
object BitmapAgg {

  val aggregator: Aggregator[Long, Array[Long], Seq[Long]] =
    new Aggregator[Long, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray

      private def ensure(b: Array[Long], words: Int): Array[Long] =
        if (b.length >= words) b else java.util.Arrays.copyOf(b, words)

      override def reduce(b: Array[Long], id: Long): Array[Long] = {
        require(id >= 0, s"bitmap id must be non-negative, got $id")
        val w = (id >> 6).toInt
        val g = ensure(b, w + 1)
        g(w) |= 1L << (id & 63)
        g
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        val (lo, hi) = if (a.length <= b.length) (a, b) else (b, a)
        val out = java.util.Arrays.copyOf(hi, hi.length)
        var i = 0
        while (i < lo.length) { out(i) |= lo(i); i += 1 }
        out
      }

      override def finish(b: Array[Long]): Seq[Long] = b.toSeq

      override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
        org.apache.spark.sql.Encoders.kryo[Array[Long]]

      override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
          .asInstanceOf[org.apache.spark.sql.Encoder[Seq[Long]]]
    }
}
