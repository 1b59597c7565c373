package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin
import graft.plans.{AsofJoinExec, NativeAsofJoin}

/** The native as-of join (LogicalPlan + Strategy + SparkPlan) must agree
  * with the union+window composition row-for-row, and its physical plan
  * must have the promised shape: the custom exec node, one shuffle per
  * side, nothing else.
  */
class NativeAsofSpec extends AnyFunSuite with BeforeAndAfterAll
    with AdaptiveSparkPlanHelper {

  @transient lazy val spark: SparkSession =
    GraftSession.create("native-asof-spec", cores = "4")

  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))
    }.toMap

  test("native as-of join == union+window composition") {
    val native = asMap(AsofJoin.purchaseAttributionNative(spark, sf))
    val windowed = asMap(AsofJoin.purchaseAttribution(spark, sf))
    assert(native.nonEmpty)
    assert(native == windowed)
    // both attributed and unattributed purchases occur
    assert(native.values.exists(_._3 == -1L))
    assert(native.values.exists(_._3 != -1L))
  }

  test("physical plan: AsofJoinExec, exactly one shuffle per side") {
    val df = AsofJoin.purchaseAttributionNative(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan
    val asofs = collect(plan) { case e: AsofJoinExec => e }
    assert(asofs.size == 1)
    val shuffles = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.size == 2)
  }

  test("ties on right ts: strictly-earlier semantics hold") {
    import spark.implicits._
    // user 1: views at t=10,20,20 — purchase at t=20 must attribute to
    // the view at t=10, not either t=20 view. user 2: no earlier view.
    val purchases = Seq((100L, 1L, 20L, 5.0), (101L, 2L, 5L, 7.0))
      .toDF("purchase_id", "user_id", "p_ts", "purchase_value")
    val views = Seq((200L, 1L, 10L), (201L, 1L, 20L), (202L, 1L, 20L),
        (203L, 2L, 8L))
      .toDF("attributed_view_id", "v_user_id", "v_ts")
    val out = NativeAsofJoin.asofJoin(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "p_ts", "v_ts")
      .select("purchase_id", "attributed_view_id")
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(100L -> 200L, 101L -> -1L))
  }
}
