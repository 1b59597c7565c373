package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Spark-native re-expression of the reference's PriceAggregator
  * (reference: src/aggregator/price_aggregator.py).
  *
  * The order stream maps onto the `events` table: event_type → product,
  * value → price, ts → order timestamp, event_id → orderId.
  *
  * All of these are single-pass hash aggregations (map-side partial agg +
  * one shuffle on the grouping key) or a single window sort — both scale
  * linearly with input and shuffle only the grouped/partitioned key space.
  */
object OrderAnalytics {

  /** THE PriceAggregator aggregate, defined once over any (product,
    * price) frame: per-product count/sum/avg/min/max
    * (price_aggregator.py:40-56, 60-86). One hash aggregate; partials
    * combine map-side so the shuffle carries only |products| rows per
    * task regardless of input size. Shared by the registered batch face
    * below and the streaming topology's main-route aggregate, so the
    * two aggregators cannot drift. */
  def priceStats(productPrice: DataFrame): DataFrame =
    productPrice
      .groupBy(col("product"))
      .agg(
        count(lit(1)).as("order_count"),
        round(sum("price"), 2).as("price_sum"),
        // exact cents summed, ONE float division: bit-identical across
        // engines (a rounded floating avg can straddle a boundary)
        (sum(round(col("price") * 100, 0).cast("long")).cast("double")
          / 100.0 / count(lit(1))).as("price_avg"),
        min("price").as("price_min"),
        max("price").as("price_max"))

  def priceStatsByProduct(spark: SparkSession, dir: String): DataFrame =
    priceStats(Tables.events(spark, dir)
      .select(col("event_type").as("product"), col("value").as("price")))

  /** Overall totals (price_aggregator.py:100-115). Single global agg:
    * partial-aggregated to one row per task, then one final reduce.
    */
  def overallStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        count(lit(1)).as("total_orders"),
        round(sum("value"), 2).as("total_revenue"),
        (sum(round(col("value") * 100, 0).cast("long")).cast("double")
          / 100.0 / count(lit(1))).as("average_order_value"),
        countDistinct("event_type").as("unique_products"))

  /** The running average the consumer logs after every processed order
    * (price_aggregator.py:36-52, avro_order_consumer.py:117-121).
    * Expressed as a cumulative window — Spark computes it with one shuffle
    * on product and a per-partition sort, no stateful driver loop.
    */
  def runningAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("product").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Integer cents end-to-end: a rounded floating running-average lands on
    // rounding boundaries for even counts (engines then disagree in the
    // last bit), so the cumulative state is exact bigint arithmetic —
    // which is also what a production aggregator should do with money.
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("ts"),
        col("event_type").as("product"),
        col("value").as("price"),
        round(col("value") * 100, 0).cast("long").as("price_cents"))
      .select(
        col("event_id"), col("product"), col("price"),
        count(lit(1)).over(w).as("running_count"),
        sum("price_cents").over(w).as("running_sum_cents"))
      .withColumn("running_avg_cents",
        expr("running_sum_cents div running_count"))
  }

  /** Products ranked by order count desc (summary sort in
    * price_aggregator.py:128-141). Ties broken by product name for
    * determinism.
    */
  def topProductsByCount(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type").as("product"))
      .agg(count(lit(1)).as("order_count"),
        round(sum("value"), 2).as("revenue"))
    counts.select(
      col("product"), col("order_count"), col("revenue"),
      row_number().over(
        Window.orderBy(col("order_count").desc, col("product"))).as("rank"))
  }

  /** 7-event moving average per product (rolling ROWS frame) — exact
    * cents so the rolling sum is engine-independent. */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("product").orderBy("ts", "event_id")
      .rowsBetween(-6, Window.currentRow)
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("ts"),
        col("event_type").as("product"),
        round(col("value") * 100, 0).cast("long").as("price_cents"))
      .select(
        col("event_id"), col("product"),
        count(lit(1)).over(w).as("window_n"),
        sum("price_cents").over(w).as("window_sum_cents"))
      .withColumn("moving_avg_cents",
        expr("window_sum_cents div window_n"))
  }

  /** Per-product stats via the typed `Aggregator`
    * (graft.functions.TypedPriceStats): the Dataset-typed face of the
    * PriceAggregator, run through `functions.udaf` so Catalyst plans it
    * as an ordinary partial-agg + one shuffle. The integer-cents buffer
    * makes mean AND population variance exact closed forms. */
  def typedStats(spark: SparkSession, dir: String): DataFrame = {
    val stats = udaf(graft.functions.TypedPriceStats.agg,
      org.apache.spark.sql.Encoders.scalaLong)
    Tables.events(spark, dir)
      .select(col("event_type").as("product"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("product")
      .agg(stats(col("cents")).as("s"))
      .select(col("product"), col("s.n").as("n_orders"),
        col("s.avg").as("avg_value"), col("s.varPop").as("var_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_moving_avg" -> movingAvg,
    "q_price_stats_by_product" -> priceStatsByProduct,
    "q_overall_stats" -> overallStats,
    "q_running_avg" -> runningAvg,
    "q_typed_stats" -> typedStats,
    "q_top_products_by_count" -> topProductsByCount)

  val oracles: Map[String, String] = Map(
    // Same closed forms over the same exact integer sums — the double
    // expressions are operation-for-operation identical, so no rounding
    // is needed for hash equality.
    "q_typed_stats" ->
      """WITH c AS (
        |  SELECT event_type AS product,
        |         CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |s AS (
        |  SELECT product, count(*) AS n,
        |         CAST(sum(cents) AS BIGINT) AS sum_cents,
        |         CAST(sum(cents * cents) AS BIGINT) AS sum_sq
        |  FROM c GROUP BY 1)
        |SELECT product, n AS n_orders,
        |       CAST(sum_cents AS DOUBLE) / 100.0 / n AS avg_value,
        |       (CAST(sum_sq AS DOUBLE)
        |          - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE) / n)
        |         / n / 10000.0 AS var_value
        |FROM s""".stripMargin,
    "q_moving_avg" ->
      """WITH cents AS (
        |  SELECT event_id, ts, event_type AS product,
        |         CAST(round(value * 100, 0) AS BIGINT) AS price_cents
        |  FROM events)
        |SELECT event_id, product,
        |       count(*) OVER w AS window_n,
        |       CAST(sum(price_cents) OVER w AS BIGINT) AS window_sum_cents,
        |       CAST((sum(price_cents) OVER w) // (count(*) OVER w) AS BIGINT) AS moving_avg_cents
        |FROM cents
        |WINDOW w AS (PARTITION BY product ORDER BY ts, event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_price_stats_by_product" ->
      """SELECT event_type AS product,
        |       count(*) AS order_count,
        |       round(sum(value), 2) AS price_sum,
        |       CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |         / 100.0 / count(*) AS price_avg,
        |       min(value) AS price_min,
        |       max(value) AS price_max
        |FROM events GROUP BY event_type""".stripMargin,
    "q_overall_stats" ->
      """SELECT count(*) AS total_orders,
        |       round(sum(value), 2) AS total_revenue,
        |       CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |         / 100.0 / count(*) AS average_order_value,
        |       count(DISTINCT event_type) AS unique_products
        |FROM events""".stripMargin,
    "q_running_avg" ->
      """WITH cents AS (
        |  SELECT event_id, event_type AS product, value AS price,
        |         CAST(round(value * 100, 0) AS BIGINT) AS price_cents, ts
        |  FROM events)
        |SELECT event_id, product, price,
        |       count(*) OVER w AS running_count,
        |       CAST(sum(price_cents) OVER w AS BIGINT) AS running_sum_cents,
        |       CAST((sum(price_cents) OVER w) // (count(*) OVER w) AS BIGINT) AS running_avg_cents
        |FROM cents
        |WINDOW w AS (PARTITION BY product ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_top_products_by_count" ->
      """WITH counts AS (
        |  SELECT event_type AS product,
        |         count(*) AS order_count,
        |         round(sum(value), 2) AS revenue
        |  FROM events GROUP BY event_type)
        |SELECT product, order_count, revenue,
        |       CAST(row_number() OVER (ORDER BY order_count DESC, product) AS INT) AS rank
        |FROM counts""".stripMargin)
}
