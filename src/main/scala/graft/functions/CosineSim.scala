package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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

  // Arrays must be float (embeddings) or double (computed centroids);
  // anything else fails analysis instead of silently reading garbage
  // 4/8-byte slices out of ArrayData.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

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
  *
  * Weights are a `Seq` (not `Array`) so case-class equality — and with
  * it expression canonicalization / semanticEquals — compares by value.
  */
case class DotConst(child: Expression, weights: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dot_const requires an array<float> input, got ${other.catalogString}")
  }

  @transient private lazy val w: Array[Double] = weights.toArray

  def dot(a: ArrayData): Double = {
    val n = math.min(a.numElements(), w.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * w(i); i += 1 }
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
  def apply(a: Column, weights: Seq[Double]): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      DotConst(org.apache.spark.sql.GraftSqlShim.expression(a), weights))
}

/** Whole-signature LSH banding kernel: for `nb = planes.length / bits`
  * bands, band `b`'s value is the integer whose bit `k` is
  * `sign(embedding · planes(b*bits + k)) > 0`. Returns `array<long>` of
  * the `nb` band values in one codegen'd pass over the row.
  *
  * One expression instead of `planes.length` separate `DotConst`
  * columns: the (bands×bits)×dims plane matrix ships once per task as a
  * reference object, the per-row cost is a single
  * `planes.length × dims` multiply-add loop, and the generated code
  * stays one call — no 700-column projection for Janino to split.
  */
case class LshBands(child: Expression, planes: Seq[Seq[Double]], bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bands requires an array<float> input, got ${other.catalogString}")
  }

  @transient private lazy val pArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  def bands(a: ArrayData): ArrayData = {
    val nb = pArr.length / bits
    val out = new Array[Long](nb)
    var b = 0
    while (b < nb) {
      var v = 0L
      var k = 0
      while (k < bits) {
        val w = pArr(b * bits + k)
        val n = math.min(a.numElements(), w.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += a.getFloat(i).toDouble * w(i); i += 1 }
        if (dot > 0) v |= (1L << k)
        k += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    bands(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBands", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bands($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}

object LshBands {
  def apply(a: Column, planes: Seq[Seq[Double]], bits: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      LshBands(org.apache.spark.sql.GraftSqlShim.expression(a), planes, bits))
}
