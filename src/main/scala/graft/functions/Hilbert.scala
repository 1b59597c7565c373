package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** `hilbert_index(x, y)` — position of the cell (x, y) along the
  * order-31 Hilbert space-filling curve, as one codegen'd loop of
  * exact integer arithmetic.
  *
  * The layout-clustering upgrade over the Morton/Z-order interleave
  * ([[graft.operators.ZOrder.zValue]]): consecutive Hilbert positions
  * are always UNIT steps in (x, y) — the curve never teleports across
  * the plane the way Z-order does at power-of-two boundaries — so a
  * file holding a contiguous index range gets a strictly tighter
  * bounding box, which is exactly what min/max footer pruning skips
  * by. The adjacency property and the bijectivity of the mapping are
  * pinned by `HilbertSpec` against [[HilbertIndex.inverse]].
  *
  * A column-expression chain for the 31 rotate/reflect rounds would
  * explode under Catalyst's CollapseProject (each round references the
  * previous x AND y several times — the inlined tree doubles per
  * round); the loop belongs in ONE opaque kernel, same codegen-resident
  * design as [[SortedIntersectSize]]. Standard iterative xy2d
  * formulation (Wikipedia, "Hilbert curve — converting between (x,y)
  * and d"); inputs are masked to the low 31 bits, so any key up to
  * 2³¹−1 round-trips without aliasing.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  def index(x0: Long, y0: Long): Long = {
    var x = x0 & HilbertIndex.Mask
    var y = y0 & HilbertIndex.Mask
    var d = 0L
    var s = 1L << (HilbertIndex.Bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = HilbertIndex.N - 1L - x
          y = HilbertIndex.N - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    index(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertIndex", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.index($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  val Bits = 31
  val N: Long = 1L << Bits
  val Mask: Long = N - 1L

  /** Column-level API over two integer keys. */
  def apply(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      HilbertIndex(
        org.apache.spark.sql.GraftSqlShim.expression(x.cast("long")),
        org.apache.spark.sql.GraftSqlShim.expression(y.cast("long"))))

  /** Reference inverse (d2xy) — the spec's oracle for bijectivity and
    * the unit-step adjacency property. */
  def inverse(d0: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2L)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4L
      s <<= 1
    }
    (x, y)
  }
}
