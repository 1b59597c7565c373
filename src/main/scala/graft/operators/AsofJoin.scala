package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of join — an operator Spark has no native form of, composed from
  * a union + ordered window (option (a) from the custom-operator ladder:
  * compose existing ops when semantics allow).
  *
  * Use case: purchase attribution — each purchase event joins to the most
  * recent strictly-earlier 'view' event of the same user. One shuffle on
  * user_id and one per-user sort, independent of how many views precede
  * each purchase (the naive inequality join would be quadratic per user).
  * The DuckDB oracle uses its native ASOF JOIN, so the composition is
  * checked against a first-class implementation.
  */
object AsofJoin {

  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    // RANGE (not ROWS) frame ending at ts-1: strictly-earlier views only,
    // matching the oracle's `v.ts < p.ts` even on timestamp ties.
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rangeBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("attributed_view_id",
        last(when(col("event_type") === "view", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("attributed_view_ts",
        last(when(col("event_type") === "view", col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("value").as("purchase_value"),
        col("attributed_view_id"),
        expr("(ts - attributed_view_ts) div 1000000000").as("view_to_purchase_s"))
  }

  /** Attribution rollup: how much purchase value each view window drives. */
  def attributionStats(spark: SparkSession, dir: String): DataFrame =
    purchaseAttribution(spark, dir)
      .groupBy(
        (col("attributed_view_id").isNotNull).as("attributed"))
      .agg(
        count(lit(1)).as("n_purchases"),
        round(sum("purchase_value"), 2).as("total_value"),
        min("view_to_purchase_s").as("min_gap_s"),
        max("view_to_purchase_s").as("max_gap_s"))

  /** The same attribution computed by the NATIVE as-of join operator
    * (graft.plans.NativeAsofJoin: LogicalPlan + Strategy + SparkPlan,
    * one co-partitioned merge pass) — driver-gated against the same
    * DuckDB ASOF JOIN oracle as the window composition above. */
  def purchaseAttributionNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("attributed_view_id"),
        col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    graft.plans.NativeAsofJoin
      .asofJoin(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "p_ts", "v_ts")
      .select(col("purchase_id"), col("user_id"), col("purchase_value"),
        col("attributed_view_id"),
        expr("(p_ts - v_ts) div 1000000000").as("view_to_purchase_s"))
  }

  /** The native as-of join with a 1-hour staleness bound: a view older
    * than an hour no longer attributes (nulls instead) — the
    * trade-to-quote tolerance semantics. The oracle takes DuckDB's
    * unbounded ASOF answer and nulls matches beyond the tolerance,
    * which is definitionally the same operator. */
  def purchaseAttributionTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("attributed_view_id"),
        col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    graft.plans.NativeAsofJoin
      .asofJoin(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "p_ts", "v_ts",
        toleranceNs = Some(3600L * 1000000000L))
      .select(col("purchase_id"), col("user_id"), col("purchase_value"),
        col("attributed_view_id"),
        expr("(p_ts - v_ts) div 1000000000").as("view_to_purchase_s"))
  }

  /** POINT-IN-TIME feature aggregation — the leakage-free feature-store
    * join: for every purchase, the SAME user's click/view counts in the
    * hour strictly BEFORE it (`f_ts ∈ [p_ts − 1h, p_ts)` — never ≥, so
    * no label leakage). Candidates come from an equi-join on
    * (user_id, hour bucket) with each feature event exploded into the
    * ≤2 buckets whose purchases it can serve — work scales with
    * same-user-same-hour pairs, never |purchases| × |events|; the
    * window predicate rides IN the left join's condition so
    * feature-less purchases survive with zero counts. Exact integer
    * nanos throughout. */
  def pitFeatures(spark: SparkSession, dir: String): DataFrame = {
    val W = 3600000000000L // 1 h in ns
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), expr(s"ts div ${W}L").as("bucket"))
    val feats = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("f_user"), col("event_type").as("f_type"),
        col("ts").as("f_ts"))
      .withColumn("b0", expr(s"f_ts div ${W}L"))
      .select(col("f_user"), col("f_type"), col("f_ts"),
        explode(array(col("b0"), col("b0") + 1)).as("f_bucket"))
    purchases.join(feats,
        col("user_id") === col("f_user") &&
          col("bucket") === col("f_bucket") &&
          col("f_ts") >= col("p_ts") - W && col("f_ts") < col("p_ts"),
        "left")
      .groupBy("purchase_id", "user_id")
      .agg(
        sum(when(col("f_type") === "click", 1L).otherwise(0L))
          .as("n_clicks_1h"),
        sum(when(col("f_type") === "view", 1L).otherwise(0L))
          .as("n_views_1h"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pit_features" -> pitFeatures,
    "q_asof_attribution" -> purchaseAttribution,
    "q_asof_native" -> purchaseAttributionNative,
    "q_asof_tolerance" -> purchaseAttributionTolerance,
    "q_asof_stats" -> attributionStats)

  private val asofOracleSql =
    """WITH views AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
      |purchases AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id AS purchase_id,
      |       p.user_id,
      |       p.value AS purchase_value,
      |       v.event_id AS attributed_view_id,
      |       (epoch_ns(p.ts) - epoch_ns(v.ts)) // 1000000000 AS view_to_purchase_s
      |FROM purchases p
      |ASOF LEFT JOIN views v
      |  ON p.user_id = v.user_id AND v.ts < p.ts""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pit_features" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |f AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS f_ts
        |  FROM events WHERE event_type IN ('click', 'view'))
        |SELECT p.purchase_id, p.user_id,
        |       CAST(count(*) FILTER (WHERE f.event_type = 'click') AS BIGINT)
        |         AS n_clicks_1h,
        |       CAST(count(*) FILTER (WHERE f.event_type = 'view') AS BIGINT)
        |         AS n_views_1h
        |FROM p LEFT JOIN f
        |  ON f.user_id = p.user_id
        | AND f.f_ts >= p.p_ts - 3600000000000 AND f.f_ts < p.p_ts
        |GROUP BY 1, 2""".stripMargin,
    "q_asof_native" -> asofOracleSql,
    "q_asof_tolerance" ->
      """WITH views AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |purchases AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |a AS (
        |  SELECT p.event_id AS purchase_id, p.user_id,
        |         p.value AS purchase_value,
        |         v.event_id AS matched_view_id,
        |         epoch_ns(p.ts) - epoch_ns(v.ts) AS gap_ns
        |  FROM purchases p
        |  ASOF LEFT JOIN views v
        |    ON p.user_id = v.user_id AND v.ts < p.ts)
        |SELECT purchase_id, user_id, purchase_value,
        |       CASE WHEN gap_ns <= 3600000000000 THEN matched_view_id END
        |         AS attributed_view_id,
        |       CASE WHEN gap_ns <= 3600000000000 THEN gap_ns // 1000000000 END
        |         AS view_to_purchase_s
        |FROM a""".stripMargin,
    "q_asof_attribution" ->
      """WITH views AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |purchases AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id,
        |       p.user_id,
        |       p.value AS purchase_value,
        |       v.event_id AS attributed_view_id,
        |       (epoch_ns(p.ts) - epoch_ns(v.ts)) // 1000000000 AS view_to_purchase_s
        |FROM purchases p
        |ASOF LEFT JOIN views v
        |  ON p.user_id = v.user_id AND v.ts < p.ts""".stripMargin,
    "q_asof_stats" ->
      """WITH views AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |purchases AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |attr AS (
        |  SELECT p.value,
        |         v.event_id AS attributed_view_id,
        |         (epoch_ns(p.ts) - epoch_ns(v.ts)) // 1000000000 AS gap_s
        |  FROM purchases p
        |  ASOF LEFT JOIN views v ON p.user_id = v.user_id AND v.ts < p.ts)
        |SELECT attributed_view_id IS NOT NULL AS attributed,
        |       count(*) AS n_purchases,
        |       round(sum(value), 2) AS total_value,
        |       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
        |       CAST(max(gap_s) AS BIGINT) AS max_gap_s
        |FROM attr GROUP BY 1""".stripMargin)
}
