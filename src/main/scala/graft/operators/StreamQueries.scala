package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.AvroOrder
import graft.streaming.OrderStream

/** Batch-checkable faces of the streaming + Avro surface (SURVEY.md §2.1
  * rows 11-12): the same transforms the streaming pipeline runs, applied
  * to the events table so the DuckDB oracle can validate them.
  */
object StreamQueries {

  /** Avro round-trip: events → Order structs → Avro binary (custom
    * ToAvroOrder expression) → decode (FromAvroOrder) → aggregate the
    * decoded stream. The aggregate matching a plain-SQL oracle over the
    * source table proves encode∘decode = id, including the varint-encoded
    * payload size check (1+len prefix per string, 4-byte float, 6-byte
    * zigzag varint for Jan-2024 epoch millis).
    */
  def avroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    AvroOrder.register(spark)
    Tables.events(spark, dir)
      .select(expr(
        """to_avro_order(named_struct(
          |  'orderId', concat('ORD-', lpad(cast(event_id as string), 7, '0')),
          |  'product', event_type,
          |  'price', cast(value as float),
          |  'timestamp', ts div 1000000)) AS avro_bytes""".stripMargin))
      .select(expr("from_avro_order(avro_bytes)").as("o"),
        length(col("avro_bytes")).as("payload_bytes"))
      .groupBy(col("o.product").as("product"))
      .agg(
        count(lit(1)).as("order_count"),
        sum(round(col("o.price") * 100, 0).cast("long")).as("sum_price_cents"),
        min(col("o.timestamp")).as("min_ts_ms"),
        max(col("o.timestamp")).as("max_ts_ms"),
        sum(col("payload_bytes").cast("long")).as("sum_payload_bytes"))
  }

  /** Schema evolution: the SAME v1 binary payloads decoded under the v2
    * reader schema (price float→double promotion, `currency` from its
    * default) — the consumer-upgrades-first path a schema registry
    * certifies. The oracle replays the promotion as
    * CAST(CAST(value AS FLOAT) AS DOUBLE) and the default as a literal,
    * proving resolution changed nothing else.
    */
  def avroEvolution(spark: SparkSession, dir: String): DataFrame = {
    AvroOrder.register(spark)
    Tables.events(spark, dir)
      .select(expr(
        """to_avro_order(named_struct(
          |  'orderId', concat('ORD-', lpad(cast(event_id as string), 7, '0')),
          |  'product', event_type,
          |  'price', cast(value as float),
          |  'timestamp', ts div 1000000)) AS avro_bytes""".stripMargin))
      .select(expr("from_avro_order_v2(avro_bytes)").as("o"))
      .groupBy(col("o.product").as("product"), col("o.currency").as("currency"))
      .agg(count(lit(1)).as("order_count"),
        sum(round(col("o.price") * 100, 0).cast("long")).as("sum_price_cents"))
  }

  /** Tumbling-hour stats per product — the batch face of
    * OrderStream.windowedStats (same code path minus the watermark, which
    * is a no-op on batch input).
    */
  def windowedStats(spark: SparkSession, dir: String): DataFrame =
    OrderStream.windowedStats(
      OrderStream.asOrders(Tables.events(spark, dir)))

  /** Hopping (sliding) windows — 1-hour length, 30-minute slide, so
    * every event lands in exactly length/slide = 2 windows. The
    * overlapping-window shape smooths windowed metrics without waiting
    * a full window for freshness; on a watermarked stream the identical
    * `window(col, len, slide)` call runs incrementally with state
    * bounded by the watermark. The oracle replays the fan-out as an
    * explicit 2-row unnest per event. */
  def hoppingStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("value") > 0 && col("event_type").isNotNull &&
        col("event_type") =!= "error")
      .select(
        window(timestamp_millis(expr("ts div 1000000")),
          "1 hour", "30 minutes").as("w"),
        col("event_type"), col("value"))
      .groupBy(col("w"), col("event_type"))
      .agg(count(lit(1)).as("order_count"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
      .select(
        unix_timestamp(col("w.start")).as("window_start_s"),
        col("event_type").as("product"),
        col("order_count"), col("sum_cents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_avro_roundtrip" -> avroRoundtrip,
    "q_avro_evolution" -> avroEvolution,
    "q_windowed_stats" -> windowedStats,
    "q_hopping_stats" -> hoppingStats)

  val oracles: Map[String, String] = Map(
    "q_avro_roundtrip" ->
      """SELECT event_type AS product,
        |       count(*) AS order_count,
        |       CAST(sum(CAST(round(CAST(CAST(value AS FLOAT) AS DOUBLE) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |       min(epoch_ns(ts) // 1000000) AS min_ts_ms,
        |       max(epoch_ns(ts) // 1000000) AS max_ts_ms,
        |       CAST(sum(CAST(11 + 1 + length(event_type) + 1 + 4 + 6 AS BIGINT)) AS BIGINT) AS sum_payload_bytes
        |FROM events GROUP BY event_type""".stripMargin,
    "q_avro_evolution" ->
      """SELECT event_type AS product,
        |       'USD' AS currency,
        |       count(*) AS order_count,
        |       CAST(sum(CAST(round(CAST(CAST(value AS FLOAT) AS DOUBLE) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_hopping_stats" ->
      """WITH e AS (
        |  SELECT epoch_ns(ts) // 1000000000 AS tsec, event_type, value
        |  FROM events
        |  WHERE value > 0 AND event_type IS NOT NULL AND event_type <> 'error'),
        |h AS (
        |  SELECT (tsec // 1800 - k.k) * 1800 AS window_start_s,
        |         event_type, value
        |  FROM e, (SELECT unnest([0, 1]) AS k) k)
        |SELECT window_start_s, event_type AS product,
        |       count(*) AS order_count,
        |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM h GROUP BY 1, 2""".stripMargin,
    "q_windowed_stats" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start_s,
        |       event_type AS product,
        |       count(*) AS order_count,
        |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       min(value) AS min_price,
        |       max(value) AS max_price
        |FROM events
        |WHERE value > 0 AND event_type IS NOT NULL AND event_type <> 'error'
        |GROUP BY 1, 2""".stripMargin)
}
