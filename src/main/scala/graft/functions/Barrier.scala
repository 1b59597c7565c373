package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports itself non-deterministic so the
  * optimizer will not substitute it into predicates and push them
  * around the plan.
  *
  * Why it exists: `PushDownPredicates` rewrites a `Filter` over a
  * `Project` by inlining the projected alias into the predicate, and
  * will happily migrate an expensive expression (e.g. a cosine over two
  * 64-float arrays) into a join condition — where
  * `BroadcastNestedLoopJoin` evaluates it interpreted, per candidate
  * pair, before cheaper conjuncts, and the surviving rows then
  * re-evaluate it in the projection. Wrapping the expensive projection
  * in `OptimizerBarrier` keeps it where it was written: computed once,
  * post-join, inside whole-stage codegen, with the filter applied to
  * the materialized column.
  *
  * The wrapper is pure pass-through for both interpreted eval and
  * codegen (same pattern as Spark's `TaggingExpression` subclasses);
  * only the `deterministic` flag differs, which is exactly the signal
  * the pushdown/collapse rules consult. Results are unchanged — the
  * child itself is deterministic.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  /** A foldable child would still be constant-folded/propagated THROUGH
    * the barrier (foldable defaults to children's), un-pinning it —
    * e.g. a barrier'd literal grain label would be stripped from window
    * partitionSpecs by FoldablePropagation. A barrier pins; it must
    * also pin constants. */
  override def foldable: Boolean = false

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): OptimizerBarrier =
    copy(child = newChild)
}

object OptimizerBarrier {
  /** Column-level API: `barrier(expensiveCol)` pins the computation at
    * the Project where it is written. */
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      OptimizerBarrier(org.apache.spark.sql.GraftSqlShim.expression(c)))
}
