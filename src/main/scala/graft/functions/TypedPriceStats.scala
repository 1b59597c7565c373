package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's PriceAggregator as a typed Spark `Aggregator`
  * (reference: src/aggregator/price_aggregator.py:40-56 keeps per-product
  * count/sum plus derived stats in a Python dict; here the same state is
  * a case-class buffer merged associatively, so Spark runs it as a
  * partial-agg + one shuffle like any built-in).
  *
  * Exactness contract: the buffer holds integer cents (count, Σc, Σc²) —
  * merge order cannot perturb the state, so the final mean/variance are
  * single IEEE expressions over exact integers and hash-match any engine
  * computing the same closed form. (A float Welford buffer would be
  * merge-order-dependent.)
  */
object TypedPriceStats {

  case class Buf(n: Long, sumCents: Long, sumSqCents: Long)
  case class Stats(n: Long, avg: Double, varPop: Double)

  val agg: Aggregator[Long, Buf, Stats] =
    new Aggregator[Long, Buf, Stats] {
      override def zero: Buf = Buf(0L, 0L, 0L)
      override def reduce(b: Buf, cents: Long): Buf =
        Buf(b.n + 1, b.sumCents + cents, b.sumSqCents + cents * cents)
      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.n + b.n, a.sumCents + b.sumCents, a.sumSqCents + b.sumSqCents)
      override def finish(b: Buf): Stats = {
        val n = b.n.toDouble
        val sum = b.sumCents.toDouble
        val sumSq = b.sumSqCents.toDouble
        Stats(b.n,
          sum / 100.0 / n,
          (sumSq - sum * sum / n) / n / 10000.0)
      }
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }
}
