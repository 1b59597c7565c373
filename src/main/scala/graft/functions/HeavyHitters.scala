package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator`: at most
  * k-1 counters per buffer, merged associatively, with the classic
  * guarantee that every item of frequency > n/k survives in the final
  * summary regardless of merge order.
  *
  * At 100 TB this finds candidate heavy keys in ONE pass with O(k)
  * state per task and an O(k)-sized shuffle — no full groupBy over the
  * key space. The summary itself is merge-order-dependent (extra
  * low-frequency items may linger), so consumers exact-verify the
  * candidates (see Profiling.heavyEventTypes): sketch for recall,
  * exact count of the small candidate set for precision — the same
  * candidates-then-verify shape as the LSH dedup operators.
  */
object HeavyHitters {

  type Buf = mutable.HashMap[String, Long]

  def aggregator(k: Int): Aggregator[String, Buf, Seq[String]] =
    new Aggregator[String, Buf, Seq[String]] {
      override def zero: Buf = mutable.HashMap.empty

      private def shrink(b: Buf): Buf = {
        while (b.size > k - 1) {
          val dec = b.valuesIterator.min
          val dead = b.iterator.collect {
            case (key, v) if v <= dec => key
          }.toList
          b.mapValuesInPlace((_, v) => v - dec)
          dead.foreach(b.remove)
        }
        b
      }

      override def reduce(b: Buf, item: String): Buf = {
        b.updateWith(item) { case c => Some(c.getOrElse(0L) + 1L) }
        shrink(b)
      }

      override def merge(a: Buf, b: Buf): Buf = {
        b.foreach { case (key, v) =>
          a.updateWith(key) { case c => Some(c.getOrElse(0L) + v) }
        }
        shrink(a)
      }

      override def finish(b: Buf): Seq[String] = b.keys.toSeq.sorted

      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }
}
