package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sessionization: gaps-and-islands over the event stream — the batch
  * face of what Structured Streaming expresses with session windows
  * (`session_window`) and the canonical per-user behavioural rollup.
  *
  * Scale: one shuffle on user_id, per-user sort; all arithmetic on exact
  * epoch-nano longs. A 30-minute inactivity gap starts a new session.
  */
object Sessionize {

  val GapNanos: Long = 30L * 60 * 1000000000L

  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val marked = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > GapNanos, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        expr("(max(ts) - min(ts)) div 1000000000").as("duration_s"),
        sum(round(col("value") * 100, 0).cast("long")).as("session_value_cents"),
        min("event_id").as("first_event_id"),
        max("event_id").as("last_event_id"))
  }

  /** Session-length distribution — the downstream rollup. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    sessions(spark, dir)
      .groupBy("n_events")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("duration_s").as("total_duration_s"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize" -> sessions,
    "q_session_stats" -> sessionStats)

  private val sessionsSql =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |         CASE WHEN lag(ts) OVER w IS NULL
       |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > ${GapNanos}
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |numbered AS (
       |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM marked)
       |SELECT user_id, session_seq,
       |       count(*) AS n_events,
       |       CAST((max(epoch_ns(ts)) - min(epoch_ns(ts))) // 1000000000 AS BIGINT) AS duration_s,
       |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS session_value_cents,
       |       min(event_id) AS first_event_id,
       |       max(event_id) AS last_event_id
       |FROM numbered GROUP BY user_id, session_seq""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sessionize" -> sessionsSql,
    "q_session_stats" ->
      s"""SELECT n_events, count(*) AS n_sessions,
         |       CAST(sum(duration_s) AS BIGINT) AS total_duration_s
         |FROM ($sessionsSql) s GROUP BY n_events""".stripMargin)
}
