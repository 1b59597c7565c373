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

  /** INTERVAL-UNION coverage per user — each event opens a fixed
    * 5-minute activity window [ts, ts+5m), and the report is the exact
    * union length of those (overlapping) windows: merged interval
    * count and covered seconds per user — the billable-time / uptime /
    * exposure measure, the companion of [[peakConcurrency]]'s
    * sweep-line (that counts simultaneous intervals; this measures the
    * covered axis). Merging uses the running MAX of window ends (the
    * dynamic-gap discipline — a long window can outlast several
    * successors; `lag` alone would split covered spans), touch-merge
    * at exact boundaries.
    *
    * Plan: user-partitioned windows only (bounded per user, never
    * global); one (user, island) aggregate then one user aggregate —
    * both map-side combined. */
  def intervalCoverage(spark: SparkSession, dir: String,
      windowNs: Long = 300L * 1000000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prior = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val islands = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("ts") + lit(windowNs)).as("end_ns"))
      .withColumn("prev_max_end", max("end_ns").over(prior))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("ts") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island",
        sum("new_island").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("n_events"), min("ts").as("s"),
        max("end_ns").as("e"))
    islands.groupBy("user_id")
      .agg(sum("n_events").as("n_events"),
        count(lit(1)).as("merged_intervals"),
        sum(expr("(e - s) div 1000000000L")).as("covered_seconds"))
  }

  /** Per-event-type inactivity gaps for [[dynamicSessions]] and the
    * native dynamic-gap `session_window` face (OrderStream): purchases
    * close a session after 10 minutes, everything else after 30 —
    * the single source both faces and the oracle derive from. */
  val PurchaseGapMs: Long = 10L * 60 * 1000
  val DefaultGapMs: Long = 30L * 60 * 1000

  /** DYNAMIC-GAP sessionization — gaps-and-islands generalized to a
    * per-event inactivity gap: each event extends its session to
    * `ts + gap(event_type)`, and a new session starts exactly when an
    * event's time EXCEEDS the running MAX of all previous session-end
    * candidates (not just the previous event's — a long-gap event can
    * outlast several short-gap successors). Boundary semantics are
    * native Spark's TOUCH-MERGE: the reported span is [start, end),
    * but an event landing exactly AT a session's end still extends it
    * (gap inactivity is measured inclusively — same as the fixed-gap
    * [[sessions]]' `> GapNanos`, and empirically pinned against the
    * native face on constructed ms-exact collisions in
    * `BucketedJoinSpec`). Millisecond resolution matches the native
    * overload's `timestamp_millis` cast. Scale shape identical to
    * [[sessions]]: one shuffle on user_id, user-bounded windows, exact
    * integer arithmetic. */
  def dynamicSessions(spark: SparkSession, dir: String): DataFrame =
    dynamicSessionsFrom(Tables.events(spark, dir))

  /** Same, over an explicit events DataFrame (user_id, event_id, ts
    * nanos, event_type, value) — the seam `BucketedJoinSpec` drives
    * with synthetic exact-boundary events. */
  private[graft] def dynamicSessionsFrom(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val marked = events
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000").as("ts_ms"), col("event_type"), col("value"))
      .withColumn("end_ms", col("ts_ms") +
        when(col("event_type") === "purchase", PurchaseGapMs)
          .otherwise(DefaultGapMs))
      .withColumn("prev_max_end",
        max("end_ms").over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_session",
        when(col("prev_max_end").isNull ||
          col("ts_ms") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("ts_ms").as("session_start_ms"),
        max("end_ms").as("session_end_ms"),
        sum(round(col("value") * 100, 0).cast("long"))
          .as("session_value_cents"))
  }

  /** Session-length distribution — the downstream rollup. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    sessions(spark, dir)
      .groupBy("n_events")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("duration_s").as("total_duration_s"))

  /** Conversion funnel (the windowFunnel shape): the earliest strictly
    * ordered signup → view → purchase chain per user, computed as three
    * conditional-min aggregations chained by user-keyed joins — every
    * stage shuffles on the same key, no per-user sequence scan on the
    * driver, ties broken by the min itself. Emits every user with the
    * deepest stage reached and the chain's epoch-micro timestamps. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    // All stage arithmetic in MICROS: DuckDB reads parquet
    // TIMESTAMP(NANOS) at micro precision, so both the emitted chain
    // timestamps AND the strict `>` comparisons must run at micro
    // resolution or a sub-microsecond gap could order differently in
    // the two engines.
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("tsu"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tsu").as("t1_us"))
    val s2 = ev.join(s1, "user_id")
      .filter(col("event_type") === "view" && col("tsu") > col("t1_us"))
      .groupBy("user_id").agg(min("tsu").as("t2_us"))
    val s3 = ev.join(s2, "user_id")
      .filter(col("event_type") === "purchase" && col("tsu") > col("t2_us"))
      .groupBy("user_id").agg(min("tsu").as("t3_us"))
    ev.select("user_id").distinct()
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3_us").isNotNull, 3).when(col("t2_us").isNotNull, 2)
          .when(col("t1_us").isNotNull, 1).otherwise(0).as("stage"),
        col("t1_us"), col("t2_us"), col("t3_us"))
  }

  /** Weekly cohort retention: cohort = a user's first active epoch-week,
    * cell (cohort, offset) = distinct users from that cohort active
    * `offset` weeks later. Two aggregations on (user, week) — the
    * standard retention triangle, integer weeks end to end. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .select(col("user_id"), expr("(ts div 1000) div 604800000000").as("wk"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("wk").as("cohort_week"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Weekly COHORT LTV triangle — [[retention]]'s revenue sibling: per
    * (cohort week, age week), the cohort's revenue that week and its
    * CUMULATIVE revenue through that age (the LTV curve a payback /
    * CAC model reads; retention counts who comes back, this weighs
    * what they spend). Cohort = the user's first active epoch-week —
    * derived once per user, joined back on the user key.
    *
    * Plan: one per-user min aggregate + one user-keyed equi join + one
    * (cohort, age) aggregate (all map-side combined); the cumulative
    * column is a cohort-PARTITIONED window over ≤|weeks| post-agg rows
    * per cohort. Exact cents throughout. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("(ts div 1000) div 604800000000").as("wk"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
    val cells = ev.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("revenue_cents"))
    val wCum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("cum_revenue_cents", sum("revenue_cents").over(wCum))
  }

  /** MATCH_RECOGNIZE-style SEQUENCE-PATTERN detection: each user's
    * event history collapses to an initial-letter string in strict
    * (ts, event_id) order, and behavioural patterns are counted as
    * exact non-overlapping substring occurrences — direct conversions
    * (view→purchase adjacent), click-assisted conversions
    * (view→click→purchase) and error doublets. The substring-count
    * identity `(len − len(replace(s, pat, ''))) / len(pat)` has
    * identical greedy left-to-right semantics in both engines, so the
    * pattern counts are bit-reproducible — no regex dialect in sight.
    *
    * Plan: one shuffle on user_id into a collect_list aggregate; the
    * per-user sequence is session-history-bounded (the same bound
    * every sequence-analytics engine assumes), and the pattern scan is
    * a narrow codegen'd projection over |users| rows. */
  def eventPatterns(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
      .groupBy("user_id")
      .agg(array_join(expr(
        "transform(sort_array(collect_list(e)), x -> x.c)"), "").as("seq"))
    def hits(pat: String): org.apache.spark.sql.Column = expr(
      s"CAST((length(seq) - length(replace(seq, '$pat', ''))) div ${pat.length} AS BIGINT)")
    ev.select(col("user_id"), length(col("seq")).cast("long").as("n_events"),
      hits("vp").as("direct_conv"),
      hits("vcp").as("assisted_conv"),
      hits("ee").as("error_doublets"))
  }

  /** PEAK CONCURRENCY per day — the interval-overlap / capacity-planning
    * primitive (max rooms occupied, max open connections): each session
    * interval from [[sessions]]' gaps-and-islands becomes a +1 point at
    * its start and a −1 at its end, and the maximum of the running sum
    * is the peak number of simultaneously-open sessions. End points
    * sort BEFORE start points at the same instant (order pts, delta:
    * −1 < +1), so back-to-back sessions at an identical timestamp never
    * double-count — the end-exclusive overlap convention, deterministic
    * down to exact nano ties.
    *
    * Per-day attribution: concurrency only changes at points, and every
    * peak occurs immediately after some +1, so the day's peak is the
    * max over its session-START instants (a day with zero starts —
    * carryover only — reports no row, by declared semantics).
    *
    * Scale shape: the running sum is [[Packing.withGlobalCumsum]]'s
    * DISTRIBUTED exact cumsum (range shuffle + broadcast prefix
    * offsets), never one unpartitioned window over all 2·|sessions|
    * points; the day rollup is a map-side-combined aggregate. The
    * oracle replays it as the single ordered window — DuckDB is the
    * referee, not the scale exemplar. */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ivals = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > GapNanos, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min("ts").as("s"), max("ts").as("e"))
    // ±1 points via ONE explode, not a self-union: the union's two legs
    // prune ivals differently (min(ts) vs max(ts)), the subtrees stop
    // being canonical, and the whole events scan + session window runs
    // TWICE. One consumer → one pass.
    val points = ivals
      .select(col("user_id"), col("session_seq"),
        explode(array(
          struct(col("s").as("pts"), lit(1L).as("delta")),
          struct(col("e").as("pts"), lit(-1L).as("delta")))).as("pt"))
      .select(col("user_id"), col("session_seq"),
        col("pt.pts").as("pts"), col("pt.delta").as("delta"))
    Packing.withGlobalCumsum(points, "delta",
        Seq("pts", "delta", "user_id", "session_seq"))
      .filter(col("delta") === 1L)
      .select(expr("pts div 86400000000000").as("day"),
        (col("cum_before") + lit(1L)).as("conc"))
      .groupBy("day")
      .agg(max("conc").as("peak_concurrency"),
        count(lit(1)).as("n_sessions_started"))
  }

  val WindowedFunnelUs: Long = 7L * 86400L * 1000000L // 7 days in micros

  /** TIME-BOUNDED conversion funnel — [[funnel]] with a deadline: every
    * later stage must land within 7 days of the user's FIRST signup,
    * the form conversion-rate reporting actually uses (an unbounded
    * funnel credits a purchase two years later to the campaign). Same
    * earliest-strict-chain semantics and micro-resolution arithmetic;
    * the deadline is one extra integer predicate per stage join, so the
    * plan shape (three user-keyed conditional-min aggregates chained on
    * one shuffle key) is unchanged. A user's funnel "expires" at
    * t1 + 7 d: stages reached after that report as not-reached. */
  def windowedFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("tsu"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tsu").as("t1_us"))
    val s2 = ev.join(s1, "user_id")
      .filter(col("event_type") === "view" && col("tsu") > col("t1_us") &&
        col("tsu") <= col("t1_us") + WindowedFunnelUs)
      .groupBy("user_id").agg(min("tsu").as("t2_us"), min("t1_us").as("t1"))
    val s3 = ev.join(s2, "user_id")
      .filter(col("event_type") === "purchase" && col("tsu") > col("t2_us") &&
        col("tsu") <= col("t1") + WindowedFunnelUs)
      .groupBy("user_id").agg(min("tsu").as("t3_us"))
    ev.select("user_id").distinct()
      .join(s1, Seq("user_id"), "left")
      .join(s2.drop("t1"), Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3_us").isNotNull, 3).when(col("t2_us").isNotNull, 2)
          .when(col("t1_us").isNotNull, 1).otherwise(0).as("stage"),
        col("t1_us"), col("t2_us"), col("t3_us"))
  }

  /** SESSION CONVERSION RATE per day — the product-analytics KPI the
    * session machinery exists to serve: sessions from the same
    * 30-minute gaps-and-islands as [[sessions]], each flagged
    * converted if it contains ≥1 purchase, rolled up per session-start
    * day with the exact conversion ppm, purchase revenue, and event
    * volume. Distinct from [[funnel]] (whose unit is the USER and
    * whose stages are ordered) — here the unit is the SESSION and the
    * question is the per-day conversion trend an on-call dashboard
    * watches.
    *
    * Plan: one shuffle on user_id (user-bounded windows), one
    * (user, session) aggregate, one small per-day aggregate — all
    * map-side combined. */
  def sessionConversion(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val per = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > GapNanos, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min("ts").as("start_ns"), count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100, 0).cast("long")).otherwise(0L))
          .as("pc"))
    per.groupBy(expr("start_ns div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n_sessions"), sum("conv").as("n_converting"),
        sum("pc").as("purchase_cents"), sum("n_events").as("n_events"))
      .select(col("day"), col("n_sessions"), col("n_converting"),
        expr("n_converting * 1000000 div n_sessions").as("conv_ppm"),
        col("purchase_cents"), col("n_events"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_session_conversion" -> sessionConversion,
    "q_peak_concurrency" -> peakConcurrency,
    "q_windowed_funnel" -> windowedFunnel,
    "q_event_patterns" -> eventPatterns,
    "q_dynamic_sessions" -> dynamicSessions,
    "q_sessionize" -> sessions,
    "q_interval_coverage" -> ((s, d) => intervalCoverage(s, d)),
    "q_session_stats" -> sessionStats,
    "q_funnel" -> funnel,
    "q_retention" -> retention,
    "q_cohort_ltv" -> cohortLtv)

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
    "q_session_conversion" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tsn, event_type,
        |         CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(tsn) OVER w IS NULL
        |      OR tsn - lag(tsn) OVER w > 1800000000000
        |    THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |                      ORDER BY tsn, event_id)),
        |s AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id
        |    ORDER BY tsn, event_id) AS seq FROM m),
        |per AS (
        |  SELECT user_id, seq, min(tsn) AS start_ns,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS conv,
        |         sum(CASE WHEN event_type = 'purchase' THEN cents
        |             ELSE 0 END) AS pc
        |  FROM s GROUP BY 1, 2)
        |SELECT start_ns // 86400000000000 AS day,
        |       CAST(count(*) AS BIGINT) AS n_sessions,
        |       CAST(sum(conv) AS BIGINT) AS n_converting,
        |       CAST(sum(conv) * 1000000 // count(*) AS BIGINT) AS conv_ppm,
        |       CAST(sum(pc) AS BIGINT) AS purchase_cents,
        |       CAST(sum(n_events) AS BIGINT) AS n_events
        |FROM per GROUP BY 1""".stripMargin,
    "q_interval_coverage" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS t,
        |         epoch_ns(ts) + 300000000000 AS end_ns
        |  FROM events),
        |m AS (SELECT *,
        |             max(end_ns) OVER (PARTITION BY user_id
        |               ORDER BY t, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               AS prev_max_end
        |      FROM e),
        |f AS (SELECT *,
        |             CASE WHEN prev_max_end IS NULL OR t > prev_max_end
        |                  THEN 1 ELSE 0 END AS new_island
        |      FROM m),
        |g AS (SELECT *,
        |             sum(new_island) OVER (PARTITION BY user_id
        |               ORDER BY t, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS island
        |      FROM f),
        |i AS (SELECT user_id, island, count(*) AS n_events,
        |             min(t) AS s, max(end_ns) AS e
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_events) AS BIGINT) AS n_events,
        |       CAST(count(*) AS BIGINT) AS merged_intervals,
        |       CAST(sum((e - s) // 1000000000) AS BIGINT) AS covered_seconds
        |FROM i GROUP BY 1""".stripMargin,
    "q_windowed_funnel" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tsu
         |  FROM events),
         |s1 AS (SELECT user_id, min(tsu) AS t1_us FROM e
         |       WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(tsu) AS t2_us, min(t1_us) AS t1
         |       FROM e JOIN s1 USING (user_id)
         |       WHERE event_type = 'view' AND tsu > t1_us
         |         AND tsu <= t1_us + ${WindowedFunnelUs} GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(tsu) AS t3_us
         |       FROM e JOIN s2 USING (user_id)
         |       WHERE event_type = 'purchase' AND tsu > t2_us
         |         AND tsu <= t1 + ${WindowedFunnelUs} GROUP BY 1),
         |u AS (SELECT DISTINCT user_id FROM e)
         |SELECT u.user_id,
         |       CAST(CASE WHEN t3_us IS NOT NULL THEN 3
         |                 WHEN t2_us IS NOT NULL THEN 2
         |                 WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END AS INT)
         |         AS stage,
         |       t1_us, t2_us, t3_us
         |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
         |       LEFT JOIN s3 USING (user_id)""".stripMargin,
    "q_peak_concurrency" ->
      s"""WITH marked AS (
         |  SELECT user_id, event_id, ts,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > ${GapNanos}
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         |  SELECT *, CAST(sum(new_session) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS session_seq
         |  FROM marked),
         |ivals AS (
         |  SELECT user_id, session_seq,
         |         min(epoch_ns(ts)) AS s, max(epoch_ns(ts)) AS e
         |  FROM numbered GROUP BY 1, 2),
         |pts AS (
         |  SELECT user_id, session_seq, s AS pts, 1 AS delta FROM ivals
         |  UNION ALL
         |  SELECT user_id, session_seq, e, -1 FROM ivals),
         |cum AS (
         |  SELECT pts, delta,
         |         sum(delta) OVER (ORDER BY pts, delta, user_id, session_seq
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
         |  FROM pts)
         |SELECT pts // 86400000000000 AS day,
         |       CAST(max(conc) AS BIGINT) AS peak_concurrency,
         |       count(*) AS n_sessions_started
         |FROM cum WHERE delta = 1 GROUP BY 1""".stripMargin,
    "q_event_patterns" ->
      """WITH s AS (
        |  SELECT user_id,
        |         string_agg(substr(event_type, 1, 1), ''
        |           ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY 1)
        |SELECT user_id,
        |       CAST(length(seq) AS BIGINT) AS n_events,
        |       CAST((length(seq) - length(replace(seq, 'vp', ''))) // 2 AS BIGINT)
        |         AS direct_conv,
        |       CAST((length(seq) - length(replace(seq, 'vcp', ''))) // 3 AS BIGINT)
        |         AS assisted_conv,
        |       CAST((length(seq) - length(replace(seq, 'ee', ''))) // 2 AS BIGINT)
        |         AS error_doublets
        |FROM s""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tsu
        |  FROM events),
        |s1 AS (SELECT user_id, min(tsu) AS t1_us FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(tsu) AS t2_us
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND tsu > t1_us GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(tsu) AS t3_us
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tsu > t2_us GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id,
        |       CAST(CASE WHEN t3_us IS NOT NULL THEN 3
        |                 WHEN t2_us IS NOT NULL THEN 2
        |                 WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage,
        |       t1_us, t2_us, t3_us
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |       LEFT JOIN s3 USING (user_id)""".stripMargin,
    "q_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |         (epoch_ns(ts) // 1000) // 604800000000 AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1)
        |SELECT c.cohort_week, u.wk - c.cohort_week AS week_offset,
        |       count(*) AS n_users
        |FROM uw u JOIN cohort c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000) // 604800000000 AS wk,
        |         CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1),
        |cells AS (
        |  SELECT c.cohort_week, e.wk - c.cohort_week AS week_offset,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(cents) AS BIGINT) AS revenue_cents
        |  FROM ev e JOIN cohort c USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_events, revenue_cents,
        |       CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week
        |         ORDER BY week_offset
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_revenue_cents
        |FROM cells""".stripMargin,
    "q_sessionize" -> sessionsSql,
    "q_dynamic_sessions" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value,
         |         epoch_ns(ts) // 1000000 AS ts_ms,
         |         epoch_ns(ts) // 1000000 +
         |           CASE WHEN event_type = 'purchase' THEN ${PurchaseGapMs}
         |                ELSE ${DefaultGapMs} END AS end_ms
         |  FROM events),
         |m AS (
         |  SELECT *, max(end_ms) OVER (PARTITION BY user_id
         |            ORDER BY ts_ms, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |            AS prev_max_end
         |  FROM e),
         |s AS (
         |  SELECT *, CASE WHEN prev_max_end IS NULL OR ts_ms > prev_max_end
         |                 THEN 1 ELSE 0 END AS new_session
         |  FROM m),
         |q AS (
         |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
         |            ORDER BY ts_ms, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |            AS BIGINT) AS session_seq
         |  FROM s)
         |SELECT user_id, session_seq, count(*) AS n_events,
         |       min(ts_ms) AS session_start_ms,
         |       max(end_ms) AS session_end_ms,
         |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         |         AS session_value_cents
         |FROM q GROUP BY 1, 2""".stripMargin,
    "q_session_stats" ->
      s"""SELECT n_events, count(*) AS n_sessions,
         |       CAST(sum(duration_s) AS BIGINT) AS total_duration_s
         |FROM ($sessionsSql) s GROUP BY n_events""".stripMargin)
}
