package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Spark-native re-expression of the reference's reliability layer:
  * validation (src/consumer/avro_order_consumer.py:95-121), dead-letter
  * routing (avro_order_consumer.py:123-155), DLQ monitoring
  * (src/consumer/dead_letter_queue_consumer.py), and the retry handler
  * (src/retry/retry_handler.py).
  *
  * In a stream processor these are per-record branches; on Spark they are
  * declarative column expressions, so the whole reliability pipeline stays
  * inside whole-stage codegen and the "route to DLQ" split is just two
  * filters over one scan (Spark reuses the scan via cache or the driver
  * runs them as separate jobs — no per-record driver loop either way).
  *
  * Failure-domain mapping onto the test tables: `event_type = 'error'`
  * plays the transient processing failure (reference simulates these at
  * avro_order_consumer.py:112-114), `value <= 0` the permanent validation
  * failure (avro_order_consumer.py:108-109), NULL required fields the
  * malformed-message failure (avro_order_consumer.py:104-106).
  */
object Reliability {

  private val retryablePatterns = Seq(
    "timeout", "connection", "unavailable", "temporary", "network",
    "socket", "503", "504", "429")

  /** Deterministic canonical error messages, keyed by event_id % 10, so the
    * classifier has realistic text to pattern-match (the reference
    * classifies on exception message text, retry_handler.py:150-175).
    */
  private val canonicalMessages = Seq(
    "Connection timeout while contacting broker",     // retryable
    "Schema registry unavailable (503)",              // retryable
    "Invalid order format: missing required fields",  // permanent
    "Network unreachable",                            // retryable
    "Rate limit exceeded (429)",                      // retryable
    "Invalid price: negative amount",                 // permanent
    "Socket closed unexpectedly",                     // retryable
    "Unknown product code",                           // permanent
    "Temporary partition reassignment in progress",   // retryable
    "Malformed Avro payload")                         // permanent

  private def messageFor(idMod: Column): Column =
    canonicalMessages.zipWithIndex.foldLeft(lit(null: String)) {
      case (acc, (msg, i)) => when(idMod === i, lit(msg)).otherwise(acc)
    }

  private def messageCaseSql(col: String): String =
    canonicalMessages.zipWithIndex
      .map { case (m, i) => s"WHEN $col = $i THEN '$m'" }
      .mkString("CASE ", " ", " END")

  private def isRetryable(msg: Column): Column =
    retryablePatterns.map(p => lower(msg).contains(p)).reduce(_ || _)

  private def isRetryableSql(expr: String): String =
    retryablePatterns
      .map(p => s"lower($expr) LIKE '%$p%'").mkString("(", " OR ", ")")

  /** THE validation predicate and error mappings, defined once: adds
    * the verdict columns to any projection of the events table that
    * still carries `event_type` and `value`. Every consumer (the
    * validation query, the DLQ monitor, the Confluent DLQ codec demo)
    * builds on this — a change to the validation semantics cannot
    * silently diverge hand-synced copies. */
  /** The verdict error-TYPE taxonomy as a reusable rule over any
    * (product, price) pair — defined once so the DLQ monitor's batch
    * face and the streaming topology's envelope leg classify
    * identically (null-field check first, like the reference's field
    * validation order, avro_order_consumer.py:99-103). */
  private[graft] def errorTypeFor(product: Column, price: Column): Column =
    when(product.isNull, "MissingField")
      .when(price <= 0, "InvalidPrice")
      .when(product === "error", "ProcessingError")

  private[graft] def withVerdict(events: DataFrame): DataFrame =
    events
      .withColumn("is_valid",
        col("value") > 0 && col("event_type").isNotNull &&
          col("event_type") =!= "error")
      .withColumn("error_type",
        errorTypeFor(col("event_type"), col("value")))
      .withColumn("error_class",
        when(col("event_type").isNull || col("value") <= 0,
          "PermanentError")
          .when(col("event_type") === "error", "RetryableError"))

  /** Per-event validation verdict (avro_order_consumer.py:95-121). */
  def validateEvents(spark: SparkSession, dir: String): DataFrame =
    withVerdict(Tables.events(spark, dir)).select(
      col("event_id"),
      col("event_type").as("product"),
      col("value").as("price"),
      col("is_valid"), col("error_type"), col("error_class"))

  /** DLQ record construction with provenance, mirroring the dead-letter
    * message shape (avro_order_consumer.py:128-143). Synthetic partition =
    * event_id % 8 (the producer keys by orderId, so partition is a pure
    * function of the key).
    */
  def dlqRoute(spark: SparkSession, dir: String): DataFrame =
    validateEvents(spark, dir)
      .filter(!col("is_valid"))
      .select(
        lit("orders").as("original_topic"),
        (col("event_id") % 8).as("original_partition"),
        col("event_id").as("original_offset"),
        col("event_id").cast("string").as("original_key"),
        col("product"),
        col("price"),
        col("error_type"),
        col("error_class"),
        messageFor(col("event_id") % 10).as("error_message"),
        when(col("error_class") === "RetryableError", 3).otherwise(0)
          .as("retry_count"),
        lit("order-processor-group").as("consumer_group"))

  /** DLQ failure counts by error type (dead_letter_queue_consumer.py:78-81,
    * 150-157). */
  def dlqStatsByType(spark: SparkSession, dir: String): DataFrame =
    dlqRoute(spark, dir)
      .groupBy("error_type", "error_class")
      .agg(count(lit(1)).as("failure_count"))

  /** DLQ failure counts by product (dead_letter_queue_consumer.py:82-84,
    * 159-166). */
  def dlqStatsByProduct(spark: SparkSession, dir: String): DataFrame =
    dlqRoute(spark, dir)
      .groupBy("product")
      .agg(
        count(lit(1)).as("failure_count"),
        round(sum("price"), 2).as("failed_value"))

  /** Exponential-backoff schedule (retry_handler.py:64-88: delay =
    * min(initial * mult^attempt, cap), then ±20% jitter): one row per
    * (failed event, attempt). The reference's jitter is `random.uniform`
    * (retry_handler.py:84-86); here the jitter fraction is md5-derived
    * from (event_id, attempt), so the schedule keeps the reference's
    * ±20% spread while staying reproducible across runs, engines and
    * partitionings — the same determinism trade the sampling operators
    * make. Demonstrates array-explode fan-out — a narrow transform, no
    * shuffle except the cumulative-delay window.
    */
  def retrySchedule(spark: SparkSession, dir: String): DataFrame = {
    val failed = validateEvents(spark, dir)
      .filter(col("error_class") === "RetryableError")
      .select("event_id", "product")
    val w = Window.partitionBy("event_id").orderBy("attempt")
    // Uniform-in-[0,1) fraction from the first 8 md5 hex digits; the
    // division by 2^32 is exact, so both engines compute the identical
    // double before the single jitter multiply.
    val hashFrac = expr(
      "CAST(conv(substr(md5(concat_ws(':', event_id, attempt)), 1, 8), 16, 10) AS BIGINT)")
      .cast("double") / lit(4294967296.0)
    failed
      .withColumn("attempt", explode(sequence(lit(0), lit(2))))
      .select(
        col("event_id"), col("product"), col("attempt"),
        least(lit(1.0) * pow(lit(2.0), col("attempt")), lit(10.0))
          .as("delay_s"))
      .withColumn("delay_jittered_s",
        round(col("delay_s") * (lit(0.8) + lit(0.4) * hashFrac), 6))
      .withColumn("cumulative_delay_s", sum("delay_s").over(w))
      .withColumn("cumulative_jittered_s", sum("delay_jittered_s").over(w))
  }

  // ---------------------------------------------------------------------
  // Retry EXECUTION model (retry_handler.py:84-141 execute_with_retry).
  // The schedule above says WHEN each re-attempt would run; the executor
  // model says WHAT HAPPENS: which attempt (if any) succeeds, where the
  // record terminally routes, and with what TRUE attempt count. The
  // reference's transient failure is `random.random() < 0.05`
  // (avro_order_consumer.py:107-108) resolving independently per attempt;
  // here the recovery attempt is md5-derived from the record id — same
  // determinism trade as the schedule's jitter, so batch SQL, the
  // streaming executor ([[graft.streaming.OrderStream.RetryExecProcessor]])
  // and the DuckDB oracle all replay the identical outcome.
  // ---------------------------------------------------------------------

  /** Attempt index (1-based retry number) at which re-processing a
    * retryable failure succeeds: uniform over 1..5, so ~60% recover
    * within the reference's 3 retries and ~40% exhaust to the DLQ. */
  def recoverAttemptCol(id: Column): Column =
    (lit(1) +
      conv(substring(md5(concat(id.cast("string"), lit(":recover"))),
        1, 8), 16, 10).cast("long") % 5).cast("int")

  /** Scala mirror of [[recoverAttemptCol]] — the streaming retry executor
    * and its spec compute the same value per record without a plan. */
  def recoverAttempt(id: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id:recover".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    (1L + java.lang.Long.parseLong(hex, 16) % 5L).toInt
  }

  /** Scala mirror of `q_retry_schedule`'s `delay_jittered_s` for one
    * (record id, attempt): min(1.0 * 2^attempt, 10.0) seconds, ±20%
    * jitter md5-derived from (id, attempt), rounded to 6 dp exactly like
    * Spark's `round` (HALF_UP) — the streaming executor arms its timers
    * with THIS, so its fire instants are the schedule's instants. */
  def backoffDelayS(id: String, attempt: Int): Double = {
    val base = math.min(1.0 * math.pow(2.0, attempt), 10.0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id:$attempt".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val frac = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    BigDecimal(base * (0.8 + 0.4 * frac))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Terminal outcome of `execute_with_retry` per failed record: the
    * route (recovered → main, exhausted/permanent → dlq), the TRUE
    * retry count (retries actually executed: the succeeding attempt
    * index, 3 on exhaustion, 0 for an immediately-permanent error — the
    * reference stamps a constant 3 on every PermanentError DLQ message,
    * avro_order_consumer.py:192, which over-reports unretried
    * failures), and the total scheduled wait those retries spent
    * (jitter-exact sum of the `q_retry_schedule` delays executed).
    * Pure projection — no explode, no shuffle: the three per-attempt
    * jitters are independent md5 columns and the wait is a CASE over
    * their prefix sums, so this survives any corpus size at scan cost. */
  def retryOutcomes(spark: SparkSession, dir: String): DataFrame = {
    def jitter(attempt: Int): Column = {
      val frac = expr("CAST(conv(substr(md5(concat_ws(':', event_id, " +
        s"$attempt)), 1, 8), 16, 10) AS BIGINT)").cast("double") /
        lit(4294967296.0)
      round(least(lit(1.0) * pow(lit(2.0), lit(attempt)), lit(10.0)) *
        (lit(0.8) + lit(0.4) * frac), 6)
    }
    validateEvents(spark, dir)
      .filter(!col("is_valid"))
      .withColumn("recover_attempt",
        when(col("error_class") === "RetryableError",
          recoverAttemptCol(col("event_id"))))
      .withColumn("route",
        when(col("error_class") === "PermanentError", "dlq")
          .when(col("recover_attempt") <= 3, "main")
          .otherwise("dlq"))
      .withColumn("retry_count",
        when(col("error_class") === "PermanentError", 0)
          .when(col("recover_attempt") <= 3, col("recover_attempt"))
          .otherwise(3).cast("int"))
      .withColumn("total_wait_s",
        when(col("retry_count") === 0, lit(0.0))
          .when(col("retry_count") === 1, jitter(0))
          .when(col("retry_count") === 2, jitter(0) + jitter(1))
          .otherwise(jitter(0) + jitter(1) + jitter(2)))
      .select("event_id", "product", "error_class", "recover_attempt",
        "route", "retry_count", "total_wait_s")
  }

  /** DLQ MONITOR (dead_letter_queue_consumer.py:56-95): the consumer
    * that reads the DLQ topic's JSON messages, PARSES each envelope,
    * and aggregates failures by error type and product from the parsed
    * fields — here as one plan that BUILDS the full reference envelope
    * (`to_json`, the exact field order `dlqEnvelope` pins byte-exact in
    * spec), parses it back (`from_json` with a strict schema — a
    * malformed envelope would surface as nulls and fail the oracle),
    * and aggregates ONLY from the parsed struct. Routing and TRUE retry
    * counts come from the executor decision table ([[retryOutcomes]]'
    * model), so the monitor sees what the retry loop actually shipped:
    * permanents unretried plus exhausted retryables with count 3 —
    * recovered records never reach the DLQ. The whole encode→parse→agg
    * chain is projections plus one hash aggregate; at 100 TB the DLQ
    * topic is a tiny fraction of traffic and this is a streaming
    * foreachBatch over it. */
  def dlqMonitor(spark: SparkSession, dir: String): DataFrame = {
    val recover = recoverAttemptCol(col("event_id"))
    val failed = withVerdict(Tables.events(spark, dir))
      .filter(!col("is_valid"))
      // executor-faithful routing: recovered retryables never land here
      .filter(col("error_class") === "PermanentError" || recover > 3)
      .select(
        col("event_id"),
        col("error_type"),
        when(col("error_class") === "PermanentError", 0)
          .otherwise(3).cast("int").as("retry_count"),
        col("event_type").as("product"),
        col("value").as("price"),
        expr("ts div 1000000").as("failed_at"),
        messageFor(col("event_id") % 10).as("error_message"))
    val envelope = failed.select(to_json(struct(
      lit("orders").as("original_topic"),
      (col("event_id") % 8).as("original_partition"),
      col("event_id").as("original_offset"),
      col("event_id").cast("string").as("original_key"),
      struct(
        concat(lit("ORD-"), lpad(col("event_id").cast("string"), 7, "0"))
          .as("orderId"),
        col("product"), col("price")).as("original_value"),
      col("error_message"),
      col("error_type"),
      col("retry_count"),
      col("failed_at"),
      lit("order-processor-group").as("consumer_group"))).as("value"))
    dlqMonitorOver(envelope)
  }

  /** The monitor's parse→aggregate half over ANY frame of DLQ envelope
    * JSON strings (column `value`) — shared by the batch face above
    * (which builds its envelopes in-plan) and the streaming topology
    * (which reads the envelopes its DLQ file sink actually shipped), so
    * the two monitors cannot drift. Reference-faithful tolerance
    * (dead_letter_queue_consumer.py:66-70, 125-126): a MALFORMED
    * envelope is skipped, never aggregated under a null group (the
    * reference logs the JSONDecodeError and polls on), and missing
    * fields take the reference's `.get` defaults — error_type
    * 'UNKNOWN', retry_count 0. The batch face's in-plan envelopes are
    * always well-formed and complete, so none of this changes its
    * oracle; it is the DIRTY-topic contract for real feeds. */
  def dlqMonitorOver(envelopes: DataFrame): DataFrame = {
    // PERMISSIVE from_json turns malformed JSON into a row of nulls —
    // indistinguishable from a valid empty envelope — so the corrupt
    // original is captured in a dedicated column and filtered on.
    val schema = "original_topic STRING, original_partition BIGINT," +
      " original_offset BIGINT, original_key STRING," +
      " original_value STRUCT<orderId: STRING, product: STRING," +
      " price: DOUBLE>, error_message STRING, error_type STRING," +
      " retry_count INT, failed_at BIGINT, consumer_group STRING," +
      " _corrupt STRING"
    // OptimizerBarrier pins the parse at this Project: without it,
    // project-collapse inlines `from_json` into the corrupt-filter
    // predicate AND every group/agg expression — the SAME string parsed
    // ~7 times per row (measured 4-6× on q_dlq_monitor when the
    // `_corrupt` filter landed). Barriered, each envelope parses once.
    envelopes
      .select(graft.functions.OptimizerBarrier(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(schema),
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt"))).as("m"))
      .filter(col("m").isNotNull && col("m._corrupt").isNull)
      .groupBy(coalesce(col("m.error_type"), lit("UNKNOWN")).as("error_type"),
        coalesce(col("m.original_value.product"), lit("UNKNOWN"))
          .as("product"))
      .agg(count(lit(1)).as("n_messages"),
        sum(coalesce(col("m.retry_count"), lit(0)).cast("long"))
          .as("total_retries"),
        max(col("m.failed_at")).as("last_failure_ms"),
        min(col("m.original_offset")).as("first_offset"))
  }

  /** Error-text classification (retry_handler.py:150-185): retryable iff
    * the lowercased message contains one of the known transient patterns;
    * default permanent.
    */
  def errorClassification(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(
        col("event_id"),
        messageFor(col("event_id") % 10).as("error_message"))
      .withColumn("is_retryable", isRetryable(col("error_message")))
      .withColumn("classified_as",
        when(col("is_retryable"), "RetryableError").otherwise("PermanentError"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_validate_events" -> validateEvents,
    "q_dlq_route" -> dlqRoute,
    "q_dlq_stats_by_type" -> dlqStatsByType,
    "q_dlq_stats_by_product" -> dlqStatsByProduct,
    "q_retry_schedule" -> retrySchedule,
    "q_retry_outcomes" -> retryOutcomes,
    "q_dlq_monitor" -> dlqMonitor,
    "q_error_classification" -> errorClassification)

  private val validateSql =
    """SELECT event_id,
      |       event_type AS product,
      |       value AS price,
      |       (value > 0 AND event_type IS NOT NULL AND event_type <> 'error') AS is_valid,
      |       CASE WHEN event_type IS NULL THEN 'MissingField'
      |            WHEN value <= 0 THEN 'InvalidPrice'
      |            WHEN event_type = 'error' THEN 'ProcessingError'
      |       END AS error_type,
      |       CASE WHEN event_type IS NULL OR value <= 0 THEN 'PermanentError'
      |            WHEN event_type = 'error' THEN 'RetryableError'
      |       END AS error_class
      |FROM events""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_validate_events" -> validateSql,
    "q_dlq_route" ->
      s"""WITH v AS ($validateSql)
         |SELECT 'orders' AS original_topic,
         |       event_id % 8 AS original_partition,
         |       event_id AS original_offset,
         |       CAST(event_id AS VARCHAR) AS original_key,
         |       product, price, error_type, error_class,
         |       ${messageCaseSql("event_id % 10")} AS error_message,
         |       CASE WHEN error_class = 'RetryableError' THEN 3 ELSE 0 END AS retry_count,
         |       'order-processor-group' AS consumer_group
         |FROM v WHERE NOT is_valid""".stripMargin,
    "q_dlq_stats_by_type" ->
      s"""WITH v AS ($validateSql)
         |SELECT error_type, error_class, count(*) AS failure_count
         |FROM v WHERE NOT is_valid GROUP BY error_type, error_class""".stripMargin,
    "q_dlq_stats_by_product" ->
      s"""WITH v AS ($validateSql)
         |SELECT product, count(*) AS failure_count,
         |       round(sum(price), 2) AS failed_value
         |FROM v WHERE NOT is_valid GROUP BY product""".stripMargin,
    "q_retry_schedule" ->
      s"""WITH v AS ($validateSql),
         |f AS (
         |  SELECT event_id, product, attempt,
         |         least(1.0 * pow(2.0, attempt), 10.0) AS delay_s
         |  FROM v CROSS JOIN (SELECT unnest([0, 1, 2]) AS attempt) a
         |  WHERE error_class = 'RetryableError'),
         |j AS (
         |  SELECT *,
         |         round(delay_s * (0.8 + 0.4 *
         |           (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' ||
         |                 CAST(attempt AS VARCHAR)), 1, 8)) AS BIGINT)
         |            / 4294967296.0)), 6) AS delay_jittered_s
         |  FROM f)
         |SELECT event_id, product, attempt, delay_s, delay_jittered_s,
         |       sum(delay_s) OVER w AS cumulative_delay_s,
         |       sum(delay_jittered_s) OVER w AS cumulative_jittered_s
         |FROM j
         |WINDOW w AS (PARTITION BY event_id ORDER BY attempt)""".stripMargin,
    "q_retry_outcomes" ->
      s"""WITH v AS ($validateSql),
         |r AS (
         |  SELECT event_id, product, error_class,
         |         CASE WHEN error_class = 'RetryableError'
         |              THEN CAST(1 + CAST(('0x' || substr(md5(
         |                     CAST(event_id AS VARCHAR) || ':recover'),
         |                     1, 8)) AS BIGINT) % 5 AS INTEGER)
         |         END AS recover_attempt
         |  FROM v WHERE NOT is_valid),
         |j AS (
         |  SELECT *,
         |    round(least(1.0 * pow(2.0, 0), 10.0) * (0.8 + 0.4 *
         |      (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':0'),
         |       1, 8)) AS BIGINT) / 4294967296.0)), 6) AS j0,
         |    round(least(1.0 * pow(2.0, 1), 10.0) * (0.8 + 0.4 *
         |      (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':1'),
         |       1, 8)) AS BIGINT) / 4294967296.0)), 6) AS j1,
         |    round(least(1.0 * pow(2.0, 2), 10.0) * (0.8 + 0.4 *
         |      (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':2'),
         |       1, 8)) AS BIGINT) / 4294967296.0)), 6) AS j2
         |  FROM r)
         |SELECT event_id, product, error_class, recover_attempt,
         |       CASE WHEN error_class = 'PermanentError' THEN 'dlq'
         |            WHEN recover_attempt <= 3 THEN 'main'
         |            ELSE 'dlq' END AS route,
         |       CAST(CASE WHEN error_class = 'PermanentError' THEN 0
         |                 WHEN recover_attempt <= 3 THEN recover_attempt
         |                 ELSE 3 END AS INTEGER) AS retry_count,
         |       CASE WHEN error_class = 'PermanentError'
         |              THEN CAST(0.0 AS DOUBLE)
         |            WHEN recover_attempt = 1 THEN j0
         |            WHEN recover_attempt = 2 THEN j0 + j1
         |            ELSE j0 + j1 + j2 END AS total_wait_s
         |FROM j""".stripMargin,
    // Replays the monitor's aggregates from the base columns: the
    // Spark side must go THROUGH to_json -> from_json, so any envelope
    // field the parse loses or distorts hash-mismatches here.
    "q_dlq_monitor" ->
      s"""WITH f AS (
         |  SELECT event_id,
         |         CASE WHEN event_type IS NULL THEN 'MissingField'
         |              WHEN value <= 0 THEN 'InvalidPrice'
         |              ELSE 'ProcessingError' END AS error_type,
         |         CASE WHEN event_type IS NULL OR value <= 0 THEN 0
         |              ELSE 3 END AS retry_count,
         |         coalesce(event_type, 'UNKNOWN') AS product,
         |         epoch_ns(ts) // 1000000 AS failed_at
         |  FROM events
         |  WHERE (event_type IS NULL OR value <= 0 OR event_type = 'error')
         |    AND (event_type IS NULL OR value <= 0
         |         OR CAST(1 + CAST(('0x' || substr(md5(
         |              CAST(event_id AS VARCHAR) || ':recover'), 1, 8))
         |              AS BIGINT) % 5 AS INTEGER) > 3))
         |SELECT error_type, product,
         |       CAST(count(*) AS BIGINT) AS n_messages,
         |       CAST(sum(retry_count) AS BIGINT) AS total_retries,
         |       CAST(max(failed_at) AS BIGINT) AS last_failure_ms,
         |       CAST(min(event_id) AS BIGINT) AS first_offset
         |FROM f GROUP BY 1, 2""".stripMargin,
    "q_error_classification" ->
      s"""WITH m AS (
         |  SELECT event_id,
         |         ${messageCaseSql("event_id % 10")} AS error_message
         |  FROM events WHERE event_type = 'error')
         |SELECT event_id, error_message,
         |       ${isRetryableSql("error_message")} AS is_retryable,
         |       CASE WHEN ${isRetryableSql("error_message")}
         |            THEN 'RetryableError' ELSE 'PermanentError' END AS classified_as
         |FROM m""".stripMargin)
}
