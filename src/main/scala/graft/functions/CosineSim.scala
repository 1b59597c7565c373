package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `cosine_sim(a, b)` over two `array<float>` columns as one codegen'd
  * expression.
  *
  * Spark evaluates array higher-order functions (`zip_with` +
  * `aggregate`) on the interpreted path per element, which puts every
  * cosine in the similarity family through ~192 boxed lambda calls per
  * pair. This expression is a single tight float loop, and its
  * arithmetic replays the HOF formulation operation-for-operation —
  * sequential fold of (double)a[i]*(double)b[i], then
  * dot/sqrt(na)/sqrt(nb) in that association — so results are
  * bit-identical to the previous implementation and to the DuckDB
  * oracle's list_sum fold.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Arrays may be float (embeddings) or double (computed centroids);
  // mirror the HOF form's `cast("double")` per element.
  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.cosine($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-level API. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      CosineSim(
        org.apache.spark.sql.GraftSqlShim.expression(a),
        org.apache.spark.sql.GraftSqlShim.expression(b)))
}

/** Dot product of a float-array column with a constant weight vector —
  * the projection kernel of hyperplane LSH. The weights live in the
  * expression instance (shipped once per task via addReferenceObj), so
  * the per-row work is one tight loop instead of interpreted lambda
  * calls that re-derive the plane per element.
  */
case class DotConst(child: Expression, weights: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  def dot(a: ArrayData): Double = {
    val n = math.min(a.numElements(), weights.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * weights(i); i += 1 }
    acc
  }

  override protected def nullSafeEval(input: Any): Any =
    dot(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotConst", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.dot($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DotConst =
    copy(child = newChild)
}

object DotConst {
  def apply(a: Column, weights: Array[Double]): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      DotConst(org.apache.spark.sql.GraftSqlShim.expression(a), weights))
}
