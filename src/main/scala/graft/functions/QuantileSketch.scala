package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, IntegerType}

/** The level-sampling quantile sketch (`Profiling.quantileSketchOf`'s
  * algebra) as a typed `Aggregator` — the PARTIAL-AGGREGATION face the
  * batch query replays relationally: per-shard state is the raised
  * threshold t plus ≤ k retained rows of weight 2ᵗ, `reduce` inserts a
  * row iff its trailing-zero level clears t, and a full buffer raises
  * t and refilters (P[ℓ ≥ t] = 2⁻ᵗ halves the survivors per step, so
  * the trim always terminates). The final (t, retained) pair is a pure
  * function of the input SET: t is the smallest threshold keeping
  * ≤ k rows — raising is forced exactly when any superset's count at
  * the lower threshold exceeded k — so merge order and partitioning
  * cannot diverge it. That set-function property is what makes the
  * sketch simultaneously a streaming aggregate (map-side combine at
  * 100 TB, micro-batch state in Structured Streaming) and
  * DuckDB-replayable; `SketchSpec` pins aggregator ≡ batch-SQL parity
  * under multiple partitionings and through a 3-batch stream.
  *
  * Items are (cents, h32, rowId) triples — the same deterministic
  * tie-break ordering the batch rank uses; the buffer is kryo'd like
  * the KMV sketch's. */
object QuantileSketch {

  /** Level of a 32-bit hash: trailing zeros, with ℓ(0) = 32 — exactly
    * the batch side's Σ_{j=1..32} [h ≡ 0 mod 2ʲ]. The input is MASKED
    * to its low 32 bits first (r15 advice): a wider hash slipped in
    * here used to return trailing-zero counts up to 63 while the
    * relational replay's Σ caps at 32 — after masking the two agree
    * for EVERY Long (for any h, tz(h & 0xFFFFFFFF) capped at 32 equals
    * Σ_{j=1..32} [h ≡ 0 mod 2ʲ], since divisibility by 2ʲ for j ≤ 32
    * only reads the low 32 bits). */
  def level(h32: Long): Int = {
    val h = h32 & 0xFFFFFFFFL
    if (h == 0L) 32 else java.lang.Long.numberOfTrailingZeros(h)
  }

  /** Mutable sketch state: threshold + retained rows (unordered —
    * `finish` sorts). */
  final class Buf(var t: Int,
      val items: mutable.ArrayBuffer[(Long, Long, Long)]) extends Serializable

  /** (t, retained rows sorted by (cents, h32, rowId)) — what a
    * persisted per-shard sketch table stores. */
  def agg(k: Int): Aggregator[(Long, Long, Long), Buf,
      (Int, Seq[(Long, Long, Long)])] =
    new Aggregator[(Long, Long, Long), Buf, (Int, Seq[(Long, Long, Long)])] {
      override def zero: Buf = new Buf(0, mutable.ArrayBuffer.empty)

      private def trim(b: Buf): Unit =
        while (b.items.length > k) {
          b.t += 1
          var w = 0; var r = 0
          while (r < b.items.length) {
            if (level(b.items(r)._2) >= b.t) { b.items(w) = b.items(r); w += 1 }
            r += 1
          }
          b.items.takeInPlace(w)
        }

      override def reduce(b: Buf, in: (Long, Long, Long)): Buf = {
        if (level(in._2) >= b.t) { b.items += in; trim(b) }
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        if (b.t > a.t) {
          a.t = b.t
          a.items.filterInPlace(it => level(it._2) >= a.t)
        }
        b.items.foreach(it => if (level(it._2) >= a.t) a.items += it)
        trim(a)
        a
      }

      override def finish(b: Buf): (Int, Seq[(Long, Long, Long)]) =
        (b.t, b.items.toSeq.sorted)

      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[(Int, Seq[(Long, Long, Long)])] =
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(Int, Seq[(Long, Long, Long)])]()
    }
}

/** `qsketch_level(h32)` — [[QuantileSketch.level]] as a codegen'd
  * Catalyst expression, the SQL face of the sketch's level function:
  * a user partitioning a persisted sketch table, or pre-filtering rows
  * against a known threshold (`WHERE qsketch_level(h32) >= t`), gets
  * the EXACT level the aggregator uses instead of hand-copying the
  * Σ-of-divisibility SQL. Registered via [[graft.GraftExtensions]]
  * alongside `qsketch_agg`. */
case class QSketchLevel(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    QuantileSketch.level(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantileSketch.level($c);")

  override protected def withNewChildInternal(
      newChild: Expression): QSketchLevel = copy(child = newChild)
}
