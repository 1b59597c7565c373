package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.OrderStream

/** Physical-layout scale tooling: bucketed tables make the big
  * fact⋈fact join shuffle-free (the 100 TB answer to "lineitem joins
  * orders every night"), and Spark's native session_window agrees with
  * the gaps-and-islands sessionizer.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val warehouse =
    Files.createTempDirectory("graft-warehouse").toFile.getAbsolutePath

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .appName("bucketed-join-spec")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.sql(
      """SELECT o_orderkey, count(*) AS n_lines, sum(l_quantity) AS qty
        |FROM lineitem_b JOIN orders_b ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString

    // Bucket-aligned scan: the join (and the groupBy on the same key)
    // must not introduce any shuffle.
    withClue(plan) {
      assert(!plan.contains("Exchange hashpartitioning"))
    }

    // and it is still correct
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").count().count()
    assert(joined.count() == expected)
  }

  test("compaction write: maxRecordsPerFile bounds output files, data intact") {
    // The small-files discipline of a 100 TB pipeline: one task writes
    // bounded-size files instead of one giant (or thousands of tiny)
    // parquet parts — reader parallelism is then controlled by file
    // layout, not by the writing job's partitioning.
    val sf = "/root/testdata/sf0.001"
    val out = new java.io.File(warehouse, "compacted-events").getAbsolutePath
    val events = Tables.events(spark, sf)
    val n = events.count()
    events.coalesce(1).write.mode("overwrite")
      .option("maxRecordsPerFile", 300).parquet(out)
    val parts = new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val expected = math.ceil(n / 300.0).toInt
    assert(parts == expected, s"$n rows at 300/file should yield $expected parts, got $parts")
    assert(spark.read.parquet(out).count() == n)
  }

  test("partitioned write enables partition pruning on read") {
    val sf = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-part").toFile.getAbsolutePath
    Tables.documents(spark, sf).write
      .partitionBy("lang").mode("overwrite").parquet(out)

    val filtered = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = filtered.queryExecution.executedPlan.toString
    withClue(scan) {
      // pruned at the partition level, not as a row filter
      assert(scan.contains("PartitionFilters") &&
        scan.contains("isnotnull(lang"))
    }
    val expected = Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(filtered.count() == expected && expected > 0)
  }

  test("native session_window matches the gaps-and-islands sessionizer") {
    val sf = "/root/testdata/sf0.001"
    val native = OrderStream
      .sessionWindowStats(Tables.events(spark, sf))
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val islands = operators.Sessionize.sessions(spark, sf)
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(native == islands && native.nonEmpty)
  }

  test("DYNAMIC-gap session_window matches the running-max islands form") {
    // Full-tuple parity (user, start, end, n_events, cents): the native
    // per-event-gap session_window against Sessionize.dynamicSessions'
    // running-max-of-ends formulation — including the end-exclusive
    // boundary and the long-gap-event-outlasts-short-gap-successors
    // merge that a lag-based islands form would get wrong.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val native = OrderStream
      .sessionWindowDynamic(Tables.events(spark, sf))
      .select("user_id", "session_start_ms", "session_end_ms",
        "n_events", "session_value_cents")
      .collect().map(key).sorted.toSeq
    val islands = operators.Sessionize.dynamicSessions(spark, sf)
      .select("user_id", "session_start_ms", "session_end_ms",
        "n_events", "session_value_cents")
      .collect().map(key).sorted.toSeq
    assert(native == islands && native.nonEmpty)
    // And the dynamic gap genuinely differs from the fixed-gap world:
    // purchases must produce MORE (or equal) sessions, never fewer.
    val nFixed = operators.Sessionize.sessions(spark, sf).count()
    assert(native.size >= nFixed.toInt)
  }

  test("dynamic-gap boundary semantics: touch-merge + running-max merge") {
    import spark.implicits._
    // Constructed cases the sf0.001 parity run can't guarantee to hit
    // (ms-exact collisions). Writing this test CAUGHT a real semantics
    // bug: the islands form used `ts >= prev_max_end => new session`
    // (end-exclusive split), but native session_window TOUCH-MERGES —
    // an event landing exactly AT a session's end still extends it
    // (inactivity is measured inclusively; only strictly-later events
    // split). The islands form now uses strict `>`, and this test pins
    // all three behaviors on both faces:
    //  - exact-boundary event MERGES (native touch-merge),
    //  - one ms past the boundary SPLITS,
    //  - a long-gap (30 min) browse window outlasting a short-gap
    //    (10 min) purchase successor keeps later events merged via the
    //    running MAX of ends (a lag-only islands form comparing to the
    //    PREVIOUS event's end would split there).
    val m = 60L * 1000 // one minute in ms; ts column is epoch NANOS
    def ev(user: Long, id: Long, tMs: Long, typ: String, v: Double) =
      (user, id, tMs * 1000000L, typ, v)
    val events = Seq(
      // user 1: view@0 (end 30m), purchase@5m (end 15m), view@20m —
      // 20m >= 15m (prev EVENT's end) but < 30m (running max) => MERGE
      // (session end becomes 50m); then view@50m+1ms is strictly past
      // the end => NEW session.
      ev(1L, 1L, 0L, "view", 1.0), ev(1L, 2L, 5L * m, "purchase", 2.0),
      ev(1L, 3L, 20L * m, "view", 3.0),
      ev(1L, 4L, 50L * m + 1L, "view", 4.0),
      // user 2: purchase@0 (end 10m), view@10m exactly at the boundary
      // => TOUCH-MERGE into one session ending 40m.
      ev(2L, 5L, 0L, "purchase", 5.0), ev(2L, 6L, 10L * m, "view", 6.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val native = OrderStream.sessionWindowDynamic(events)
      .select("user_id", "session_start_ms", "session_end_ms",
        "n_events", "session_value_cents")
      .collect().map(key).sorted.toSeq
    val islands = operators.Sessionize.dynamicSessionsFrom(events)
      .select("user_id", "session_start_ms", "session_end_ms",
        "n_events", "session_value_cents")
      .collect().map(key).sorted.toSeq
    val expected = Seq(
      (1L, 0L, 50L * m, 3L, 600L),                    // running-max merge
      (1L, 50L * m + 1L, 80L * m + 1L, 1L, 400L),     // 1 ms past end splits
      (2L, 0L, 40L * m, 2L, 1100L)).sorted            // touch-merge
    assert(native == expected, s"native face: $native")
    assert(islands == expected, s"islands face: $islands")
  }
}
