package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StructType}

import graft.functions.{AvroOrder, FromAvroOrder, ToAvroOrder}

/** Optimizer rule: `from_avro_order(to_avro_order(x))` ⇒ `x`.
  *
  * Sound because the codec is a bijection on well-typed Order structs
  * (proved by the property round-trip spec): serializing to Avro binary
  * and immediately decoding is the identity, so pipelines that encode for
  * a sink while an in-flight consumer decodes the same column collapse to
  * a no-op instead of paying two Avro passes per row.
  *
  * Guard: only fires when the struct's shape equals the Order schema
  * (names + types, nullability ignored — the codec itself requires
  * non-null fields either way).
  */
object AvroRoundTripElision extends Rule[LogicalPlan] {

  private def shapeMatches(dt: DataType): Boolean = (dt, AvroOrder.sparkType) match {
    case (a: StructType, b: StructType) =>
      a.length == b.length &&
        a.fields.zip(b.fields).forall { case (fa, fb) =>
          fa.name == fb.name && fa.dataType == fb.dataType
        }
    case _ => false
  }

  private def elide(e: Expression): Expression = e match {
    case FromAvroOrder(ToAvroOrder(child)) if shapeMatches(child.dataType) =>
      child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => elide(e) }
}
