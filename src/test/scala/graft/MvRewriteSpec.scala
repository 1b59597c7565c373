package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.OlapQueries
import graft.plans.{MvCatalog, MvRewrite}

/** Materialized-view rewrite: the optimizer must answer a re-statement
  * of a registered view's defining aggregate FROM THE VIEW PARQUET —
  * fact scan gone from the plan — and produce identical rows; a plan
  * that does not match must pass through untouched.
  */
class MvRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  @transient lazy val spark: SparkSession =
    GraftSession.create("mv-rewrite-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  test("matching aggregate is answered from the view, exactly") {
    val direct = OlapQueries.quarterlyRevenueDef(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val rewritten = OlapQueries.mvRewrite(spark, sfDir)
    try {
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("graft-mv-quarterly"),
        s"executed plan must scan the view parquet:\n$plan")
      assert(!plan.contains("orders.parquet"),
        s"executed plan must NOT scan the fact table:\n$plan")
      val got = rewritten.collect().map(_.toString).sorted.toSeq
      assert(got == direct, "view must reproduce the aggregate exactly")

      // A nearby-but-different aggregate (extra grouping key) must NOT
      // match: exact-match rewriting never fires on containment.
      import org.apache.spark.sql.functions._
      val other = Tables.orders(spark, sfDir)
        .select(((year(col("o_orderdate")) - 1992) * 4 +
          quarter(col("o_orderdate")) - 1).cast("long").as("qtr"),
          col("o_orderstatus").as("st"),
          expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
        .groupBy("qtr", "st")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
      val otherPlan = other.queryExecution.executedPlan.toString
      assert(!otherPlan.contains("graft-mv-quarterly"),
        s"non-matching aggregate must keep its own plan:\n$otherPlan")

      // Deregistration restores the fact scan for the SAME query.
      MvCatalog.deregisterPrefix(s"quarterly_revenue:$sfDir")
      val back = OlapQueries.quarterlyRevenueDef(spark, sfDir)
      val backPlan = back.queryExecution.executedPlan.toString
      assert(!backPlan.contains("graft-mv-quarterly") &&
        backPlan.contains("orders.parquet"),
        s"deregistered view must stop rewriting:\n$backPlan")
    } finally {
      MvCatalog.deregisterPrefix(s"quarterly_revenue:$sfDir")
      MvCatalog.deregisterPrefix(s"quarterly_revenue_rollup:$sfDir")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
    }
  }

  test("filtered restatement reads the view with the residual pushed") {
    import org.apache.spark.sql.functions.col
    // Expected rows computed with the catalog EMPTY (fact-table plan).
    val direct = OlapQueries.quarterlyRevenueDef(spark, sfDir)
      .filter(col("qtr") >= 8)
      .collect().map(_.toString).sorted.toSeq
    val rewritten = OlapQueries.mvRewriteFiltered(spark, sfDir)
    try {
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("graft-mv-quarterly"),
        s"filtered restatement must scan the view parquet:\n$plan")
      assert(!plan.contains("orders.parquet"),
        s"filtered restatement must NOT scan the fact table:\n$plan")
      // The residual predicate must land on the VIEW scan as a parquet
      // pushed filter — the whole payoff of rewriting BEFORE pushdown.
      assert(plan.contains("PushedFilters: [IsNotNull(qtr), GreaterThanOrEqual(qtr,8)]")
          || plan.contains("GreaterThanOrEqual(qtr,8)"),
        s"residual qtr >= 8 must be pushed into the view scan:\n$plan")
      val got = rewritten.collect().map(_.toString).sorted.toSeq
      assert(got == direct,
        "filtered view read must reproduce the filtered aggregate exactly")
    } finally {
      MvCatalog.deregisterPrefix(s"quarterly_revenue:$sfDir")
      MvCatalog.deregisterPrefix(s"quarterly_revenue_rollup:$sfDir")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
    }
  }

  test("yearly roll-up re-aggregates the view; non-decomposable near-miss untouched") {
    import org.apache.spark.sql.functions._
    // Expected rows computed with the catalog EMPTY (fact-table plan).
    val direct = OlapQueries.yearlyRevenueDef(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val rolled = OlapQueries.mvRollupYear(spark, sfDir)
    try {
      val plan = rolled.queryExecution.executedPlan.toString
      assert(plan.contains("graft-mv-quarterly"),
        s"yearly roll-up must scan the quarterly view parquet:\n$plan")
      assert(!plan.contains("orders.parquet"),
        s"yearly roll-up must NOT scan the fact table:\n$plan")
      val got = rolled.collect().map(_.toString).sorted.toSeq
      assert(got == direct,
        "re-aggregated view must reproduce the yearly aggregate exactly")

      // NEAR-MISS: an exact yearly median is NOT decomposable over the
      // view's (count, sum) — no containment, so the rewrite must not
      // fire and the fact plan stays.
      val median = Tables.orders(spark, sfDir)
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          col("o_totalprice"))
        .groupBy("yr")
        .agg(expr("percentile(o_totalprice, 0.5)").as("median_price"))
      val mPlan = median.queryExecution.executedPlan.toString
      assert(!mPlan.contains("graft-mv-quarterly") &&
        mPlan.contains("orders.parquet"),
        s"non-decomposable aggregate must keep its fact plan:\n$mPlan")
    } finally {
      MvCatalog.deregisterPrefix(s"quarterly_revenue:$sfDir")
      MvCatalog.deregisterPrefix(s"quarterly_revenue_rollup:$sfDir")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
    }
  }

  test("join-over-view: dim joins survive over the view scan; finer " +
      "restatement (join key not in view output) keeps its fact plan") {
    import org.apache.spark.sql.functions._
    // Expected rows computed with the catalog EMPTY (fact-table plan).
    val direct = OlapQueries.nationRevenueDef(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("n_orders"), col("total_cents"))
      .collect().map(_.toString).sorted.toSeq
    val rewritten = OlapQueries.mvRewriteJoin(spark, sfDir)
    try {
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("graft-mv-nation"),
        s"joined restatement must scan the view parquet:\n$plan")
      assert(!plan.contains("orders.parquet") &&
        !plan.contains("customer.parquet"),
        s"joined restatement must NOT scan fact or customer:\n$plan")
      // the dim joins must SURVIVE the substitution (they sit above the
      // matched Aggregate subtree, over the |nations|-row view read)
      assert(plan.contains("nation.parquet") && plan.contains("region.parquet"),
        s"dim scans must remain above the view read:\n$plan")
      val got = rewritten.collect().map(_.toString).sorted.toSeq
      assert(got == direct,
        "view-backed join must reproduce the fact-path rows exactly")

      // NEAR-MISS: a FINER aggregate (per-custkey) joined to the same
      // dims — the join grain (custkey) is not in the view's output, so
      // no catalog entry matches and the fact plan stays.
      val finer = Tables.orders(spark, sfDir)
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
        .join(Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
        .join(broadcast(Tables.nation(spark, sfDir)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
      val fPlan = finer.queryExecution.executedPlan.toString
      assert(!fPlan.contains("graft-mv-nation") &&
        fPlan.contains("orders.parquet"),
        s"finer-grained joined restatement must keep its fact plan:\n$fPlan")
    } finally {
      MvCatalog.deregisterPrefix(s"nation_revenue:$sfDir")
      MvCatalog.deregisterPrefix(s"quarterly_revenue:$sfDir")
      MvCatalog.deregisterPrefix(s"quarterly_revenue_rollup:$sfDir")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
    }
  }

  test("re-registration is check-then-skip: second call still rewrites") {
    try {
      // First call registers; the rule is now live, so a second call
      // re-derives the defining plan in REWRITTEN form — before the
      // ADVICE-r11 fix it overwrote the aggregate canon with the
      // view-scan form and every later restatement silently reverted
      // to the fact plan.
      OlapQueries.mvRewrite(spark, sfDir)
      val second = OlapQueries.mvRewrite(spark, sfDir)
      val plan = second.queryExecution.executedPlan.toString
      assert(plan.contains("graft-mv-quarterly") &&
        !plan.contains("orders.parquet"),
        s"second mvRewrite call must still be answered from the view:\n$plan")
    } finally {
      MvCatalog.deregisterPrefix(s"quarterly_revenue:$sfDir")
      MvCatalog.deregisterPrefix(s"quarterly_revenue_rollup:$sfDir")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
    }
  }
}
