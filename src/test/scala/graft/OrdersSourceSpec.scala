package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom DataSource V2 connector: planning-time behaviour
  * (partition pruning + pushed bounds) and row-content determinism.
  */
class OrdersSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("orders-source-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  private def read(rows: Int, parts: Int) =
    spark.read.format("graft.sources.OrdersSource")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  /** The [lo, hi) id bounds the scan actually consumed, read
    * structurally off the planned OrdersScan — robust to any formatting
    * change in the scan's description string. */
  private def pushedBounds(df: org.apache.spark.sql.DataFrame): (Long, Long) =
    df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    } match {
      case Some(s: graft.sources.OrdersScan) => s.pushedBounds
      case other => fail(s"no OrdersScan in plan, found: $other")
    }

  test("reported partitioning: bucket-clustered aggregation plans NO shuffle") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = read(2000, 4)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("price_cents").as("cents"))
      val plan = df.queryExecution.executedPlan.toString
      withClue(plan) {
        assert(!plan.contains("Exchange hashpartitioning"),
          "bucket groupBy must use the scan's KeyGroupedPartitioning")
      }
      val got = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // Replay: 4 buckets of 500 ids each.
      val want = (0L until 2000L).groupBy(_ / 500).map { case (b, ids) =>
        b -> (ids.size.toLong, ids.map(graft.sources.OrdersSource.priceCents).sum)
      }
      assert(got == want)
      // Control: without the conf the same query DOES shuffle.
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val plan2 = read(2000, 4).groupBy("bucket").agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      assert(plan2.contains("Exchange hashpartitioning"),
        s"control: conf off must plan a shuffle\n$plan2")
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("generates the full deterministic id space across partitions") {
    val df = read(10000, 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 10000)
    val row = df.filter(col("order_id") === 7L)
      .collect().map(r => (r.getString(1), r.getLong(2))).head
    assert(row == (graft.sources.OrdersSource.product(7L),
      graft.sources.OrdersSource.priceCents(7L)))
  }

  test("order_id bounds prune partitions and narrow generation") {
    // rows=20000, parts=8 → 2500 ids per slice; [5000, 10000) covers
    // exactly slices 2 and 3 — the other six must not even be planned.
    val df = read(20000, 8)
      .filter(col("order_id") >= 5000L && col("order_id") < 10000L)
    assert(df.rdd.getNumPartitions == 2,
      s"expected 2 surviving partitions, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 5000)
    assert(pushedBounds(df) == (5000L, 10000L))
  }

  test("streams the id space incrementally as a MicroBatchStream") {
    // 1000 ids at 300/batch → batches of 300/300/300/100; the memory
    // sink must end up with every id exactly once, same content as the
    // batch read — the custom source working as a drop-in readStream.
    val q = spark.readStream.format("graft.sources.OrdersSource")
      .option("rows", "1000").option("parts", "4")
      .option("rowsPerBatch", "300").load()
      .writeStream.format("memory").queryName("orders_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("orders_stream_test")
      assert(got.count() == 1000)
      assert(got.select("order_id").distinct().count() == 1000)
      val sample = got.filter(col("order_id") === 999L)
        .collect().map(r => (r.getString(1), r.getLong(2))).head
      assert(sample == (graft.sources.OrdersSource.product(999L),
        graft.sources.OrdersSource.priceCents(999L)))
      assert(q.recentProgress.count(_.numInputRows > 0) == 4,
        "expected exactly 4 non-empty micro-batches")
    } finally q.stop()
  }

  test("catalog plugin serves the connector through plain SQL") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val n = spark.sql("SELECT count(*) AS n FROM graft.orders2500")
      .collect()(0).getLong(0)
    assert(n == 2500)
    // Pushdown still applies through the catalog path.
    val agg = spark.sql(
      """SELECT product, count(*) AS c FROM graft.orders2500
        |WHERE order_id >= 2000 GROUP BY product""".stripMargin)
    assert(agg.collect().map(_.getLong(1)).sum == 500)
    val err = intercept[Exception](
      spark.sql("SELECT * FROM graft.nope").collect())
    assert(err.getMessage.toLowerCase.contains("table"))
    // A fat-fingered row count (> 10^9) must fail as an unknown table,
    // not silently plan a ~10^14-row generated scan.
    val tooBig = intercept[Exception](
      spark.sql("SELECT count(*) FROM graft.orders100000000000").collect())
    assert(tooBig.getMessage.toLowerCase.contains("table"))
  }

  test("equality, strict and inclusive bounds all prune, int or long typed") {
    // = v plans as [v, v+1): exactly one partition, one row.
    val eq = read(20000, 8).filter(col("order_id") === 12345)
    assert(eq.rdd.getNumPartitions == 1)
    assert(pushedBounds(eq) == (12345L, 12346L))
    assert(eq.count() == 1)

    // > v / <= v with INT-typed literals: [15001, 17500) — slice 6 only
    // (slices are [15000, 17500) and [17500, 20000)).
    val range = read(20000, 8)
      .filter(col("order_id") > 15000 && col("order_id") <= 17499)
    assert(range.rdd.getNumPartitions == 1,
      s"expected 1 surviving partition, got ${range.rdd.getNumPartitions}")
    assert(pushedBounds(range) == (15001L, 17500L))
    assert(range.count() == 2499)
  }

  test("Long.MaxValue bounds stay post-scan filters, results stay right") {
    // `order_id > MaxValue` / `<= MaxValue` / `= MaxValue` would wrap
    // negative under the +1 pushdown arithmetic; the builder must
    // decline them (keep them post-scan) so the results stay correct.
    val max = Long.MaxValue
    val gt = read(1000, 4).filter(col("order_id") > max)
    assert(gt.count() == 0, "order_id > Long.MaxValue must match nothing")
    val le = read(1000, 4).filter(col("order_id") <= max)
    assert(le.count() == 1000, "order_id <= Long.MaxValue must match all")
    val eq = read(1000, 4).filter(col("order_id") === max)
    assert(eq.count() == 0)
    // Declined means NOT consumed: the scan's bounds must remain the
    // full id space — no narrowed bound may have been consumed.
    assert(pushedBounds(le) == (0L, 1000L),
      "MaxValue predicate must not narrow the pushed bounds")
  }

  test("DSv2 write path: commit protocol carries exact per-task row accounting") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    graft.sources.GraftSinkRegistry.reset()
    spark.sql(
      "INSERT INTO graft.sink SELECT order_id, product, price_cents " +
        "FROM graft.orders2500")
    assert(graft.sources.GraftSinkRegistry.commits.get() == 1L,
      "exactly one job-level commit")
    assert(graft.sources.GraftSinkRegistry.lastCommitRows.get() == 2500L,
      "commit messages must account for every written row")
    // One writer (and one commit message) per input partition: the
    // 2500-row generator plans 8 slices.
    assert(graft.sources.GraftSinkRegistry.lastCommitTasks.get() == 8L)
    assert(graft.sources.GraftSinkRegistry.aborts.get() == 0L)

    // Schema contract enforced at analysis time, not at runtime.
    val err = intercept[Exception](spark.sql(
      "INSERT INTO graft.sink SELECT order_id FROM graft.orders2500"))
    assert(err.getMessage.toLowerCase.matches("(?s).*(column|schema|insert).*"))
  }

  test("catalog resolves zero-padded identifiers within the cap") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    // 11 digits as written, value 1 — leading zeros must not trip the
    // overflow length guard.
    val n = spark.sql("SELECT count(*) AS n FROM graft.orders00000000001")
      .collect()(0).getLong(0)
    assert(n == 1)
    // Zero-padded but over the cap still fails at analysis.
    val over = intercept[Exception](
      spark.sql("SELECT count(*) FROM graft.orders0100000000000").collect())
    assert(over.getMessage.toLowerCase.contains("table"))
  }

  test("non-pushable predicates remain post-scan filters") {
    val df = read(1000, 4).filter(col("product") === "Mouse")
    // product filter can't prune the id space — all partitions planned,
    // rows still correct.
    assert(df.rdd.getNumPartitions == 4)
    val expected = (0L until 1000L)
      .count(graft.sources.OrdersSource.product(_) == "Mouse")
    assert(df.count() == expected)
  }

  /** The planned DSv2 scan, descending through the AQE wrapper that
    * aggregate queries (unlike the bare filter queries above) get. */
  private def plannedScan(df: org.apache.spark.sql.DataFrame) = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.getOrElse(fail(s"no DSv2 scan in plan:\n$plan"))
  }

  test("aggregation pushes into the source as partition partials") {
    import graft.sources.OrdersSource.{priceCents, product}
    val df = read(200000, 8).groupBy("product")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("s"),
        min("price_cents").as("mn"), max("price_cents").as("mx"))
    plannedScan(df) match {
      case s: graft.sources.OrdersAggScan =>
        // group column first, then one Long per aggregate
        assert(s.readSchema().fieldNames.head == "product")
        assert(s.readSchema().length == 5)
      case other => fail(s"aggregation not pushed, scan = $other")
    }
    val expected = (0L until 200000L).groupBy(product).map { case (p, ids) =>
      val cents = ids.map(priceCents)
      (p, ids.size.toLong, cents.sum, cents.min, cents.max)
    }.toSet
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("pushed aggregation composes with pushed id bounds") {
    val df = read(20000, 8)
      .filter(col("order_id") >= 5000L && col("order_id") < 10000L)
      .groupBy("product").agg(count(lit(1)).as("n"))
    plannedScan(df) match {
      case s: graft.sources.OrdersAggScan =>
        assert(s.pushedBounds == (5000L, 10000L))
        // [5000, 10000) covers slices 2 and 3 only — two partial readers.
        assert(s.planInputPartitions().length == 2)
      case other => fail(s"aggregation not pushed, scan = $other")
    }
    assert(df.agg(sum("n")).collect().head.getLong(0) == 5000L)
  }

  test("streaming write: per-epoch two-phase commits, replayed epochs idempotent") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    graft.sources.GraftSinkRegistry.reset()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sink-stream").toFile.getAbsolutePath
    // Custom DSv2 stream → custom DSv2 streaming sink: 1000 ids at 250
    // per micro-batch = 4 epochs end to end through the catalog.
    val q = spark.readStream.format("graft.sources.OrdersSource")
      .option("rows", "1000").option("parts", "4")
      .option("rowsPerBatch", "250").load()
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("graft.sink")
    try {
      (1 to 20).takeWhile { _ =>
        q.processAllAvailable()
        graft.sources.GraftSinkRegistry.epochCommits.values.asScala
          .map(_._1).sum < 1000L
      }
    } finally q.stop()
    val ledger = graft.sources.GraftSinkRegistry.epochCommits.asScala
    assert(ledger.values.map(_._1).sum == 1000L,
      s"epoch ledger must account for every row: $ledger")
    assert(ledger.size == 4, s"expected 4 committed epochs: $ledger")
    assert(graft.sources.GraftSinkRegistry.replayedEpochs.get() == 0L)

    // The exactly-once seam in isolation: a re-delivered epoch commit
    // (checkpoint recovery re-running a finished batch) must leave the
    // ledger untouched and be counted as a replay.
    graft.sources.GraftSinkRegistry.recordEpoch(7L, 111L, 2)
    graft.sources.GraftSinkRegistry.recordEpoch(7L, 111L, 2)
    assert(graft.sources.GraftSinkRegistry.epochCommits.get(7L) == ((111L, 2)))
    assert(graft.sources.GraftSinkRegistry.replayedEpochs.get() == 1L)
  }

  test("progress listener ledgers exact per-batch row counts") {
    val ledger = new graft.streaming.OrderStream.ProgressLedger
    spark.streams.addListener(ledger)
    val q = spark.readStream.format("graft.sources.OrdersSource")
      .option("rows", "1000").option("parts", "4")
      .option("rowsPerBatch", "250").load()
      .writeStream.format("noop").queryName("ledger_test").start()
    try {
      q.processAllAvailable()
      // Listener events are delivered asynchronously after the batch
      // completes — wait for the ledger to catch up.
      (1 to 100).takeWhile { _ =>
        Thread.sleep(50)
        ledger.batches.asScala.filter(_.numInputRows > 0).map(_.numInputRows)
          .sum < 1000L
      }
    } finally {
      q.stop()
      spark.streams.removeListener(ledger)
    }
    val rows = ledger.batches.asScala.filter(_.queryName == "ledger_test")
    assert(rows.filter(_.numInputRows > 0).map(_.numInputRows).sum == 1000L,
      s"ledger must account for every input row: $rows")
    assert(rows.count(_.numInputRows == 250L) == 4,
      s"expected 4 exact 250-row batches: $rows")
    assert(ledger.starts.get() >= 1L)
  }

  test("runtime In filter narrows bounds, prunes slices and drives id-list readers") {
    // Unit face of SupportsRuntimeFiltering: hand the scan a runtime
    // key set directly and observe planning + reading behaviour.
    val scan = plannedScan(read(20000, 8)) match {
      case s: graft.sources.OrdersScan => s
      case other => fail(s"unexpected scan $other")
    }
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("order_id",
        Array[Any](java.lang.Long.valueOf(7000L), java.lang.Long.valueOf(7002L),
          java.lang.Long.valueOf(12000L)))))
    assert(scan.runtimeState == ((7000L, 12001L, Some(3))))
    // [7000, 12001) spans slices 2..4 of 2500 → 3 survive.
    val parts = scan.planInputPartitions()
    assert(parts.length == 3)
    // Readers walk ONLY the surviving ids inside their slice.
    val factory = scan.createReaderFactory()
    val got = parts.flatMap { p =>
      val r = factory.createReader(p)
      Iterator.continually(r).takeWhile(_.next()).map(_.get().getLong(0)).toList
    }.sorted
    assert(got.toSeq == Seq(7000L, 7002L, 12000L))
  }

  test("join-driven dynamic pruning reaches the source at runtime") {
    val old = (spark.conf.get("spark.sql.adaptive.enabled"),
      spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly"))
    try {
      // Non-AQE so the inspected plan instance IS the executed one;
      // reuseBroadcastOnly off so DPP plans the subquery for a DSv2 scan.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      val fact = read(20000, 8)
      val dim = spark.range(100, 160).select((col("id") * 100).as("k"))
        .filter(col("k") % 200 === 0) // selective build side → DPP benefit
      val j = fact.join(dim, fact("order_id") === dim("k"))
      assert(j.collect().length == 30)
      val b = j.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.getOrElse(fail("no scan"))
      assert(b.runtimeFilters.nonEmpty, "no runtime filter planned on the scan")
      b.scan match {
        case s: graft.sources.OrdersScan =>
          // 30 runtime keys in [10000, 15800] → bounds narrowed, 3/8
          // slices survive, readers saw exactly the key list.
          assert(s.runtimeState == ((10000L, 15801L, Some(30))))
          assert(s.planInputPartitions().length == 3)
        case other => fail(s"unexpected scan $other")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", old._1)
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", old._2)
    }
  }

  test("full reference topology in one query: DSv2 stream → validate → DLQ split → DSv2 sink") {
    // The reference's whole consumer topology (producer → consume →
    // validate → aggregate-or-DLQ → commit) as ONE streaming query
    // through the repo's own connectors: the custom MicroBatchStream
    // source feeds OrderStream's validate/dlqSplit, valid records land
    // in the custom DSv2 sink's two-phase commit protocol, failures in
    // the DLQ side output with provenance. In production the source
    // line is a Kafka readStream — everything downstream is identical.
    import graft.streaming.OrderStream
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    graft.sources.GraftSinkRegistry.reset()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-topology-ckpt").toFile.getAbsolutePath

    val raw = spark.readStream.format("graft.sources.OrdersSource")
      .option("rows", "1000").option("parts", "4")
      .option("rowsPerBatch", "250").load()
    // Simulated wire corruption (the reference's corrupt Avro payloads
    // and known-bad orders): ids ≡13 (mod 97) arrive with a
    // non-positive price → PermanentError; ids ≡50 (mod 97) with the
    // poison product → RetryableError.
    val orders = raw.select(
      col("order_id"),
      concat(lit("ORD-"), lpad(col("order_id").cast("string"), 7, "0"))
        .as("orderId"),
      when(col("order_id") % 97 === 50, "error")
        .otherwise(col("product")).as("product"),
      when(col("order_id") % 97 === 13, lit(-1.0))
        .otherwise(col("price_cents").cast("double") / 100.0).as("price"))

    val mainRows = new java.util.concurrent.atomic.AtomicLong(0)
    val mainSink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (df, _) => {
        val sinkShape = df.select(col("order_id"), col("product"),
          round(col("price") * 100, 0).cast("long").as("price_cents"))
        mainRows.addAndGet(sinkShape.count())
        sinkShape.writeTo("graft.sink").append()
      }
    val dlq = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, String)]()
    val dlqSink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (df, _) => df.select("order_id", "error_class", "retry_count",
          "original_topic").collect()
        .foreach(r => dlq.add((r.getLong(0), r.getString(1), r.getInt(2),
          r.getString(3))))

    val q = orders.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(OrderStream.dlqSplit(mainSink, dlqSink))
      .start()
    try q.processAllAvailable() finally q.stop()

    // Exact accounting: every generated id lands exactly once, on
    // exactly one side of the split. Since round 14 dlqSplit routes
    // like the retry executor: retryable failures whose deterministic
    // recovery attempt is within 3 retries RECOVER to main; only
    // exhausted retryables and permanents reach the DLQ.
    val badPermanent = (0L until 1000L).filter(_ % 97 == 13).toSet
    val badRetryable = (0L until 1000L).filter(_ % 97 == 50).toSet
    val exhausted = badRetryable.filter(id =>
      graft.operators.Reliability.recoverAttempt(f"ORD-$id%07d") > 3)
    assert(exhausted.nonEmpty && exhausted != badRetryable,
      "poison set must exercise BOTH recovery and exhaustion")
    val dlqSeq = dlq.asScala.toSeq
    assert(mainRows.get() + dlqSeq.size == 1000L,
      s"split must partition the stream: ${mainRows.get()} + ${dlqSeq.size}")
    assert(dlqSeq.map(_._1).toSet == badPermanent ++ exhausted)
    assert(dlqSeq.collect { case (id, "PermanentError", rc, _) => (id, rc) }
      .toMap == badPermanent.map(_ -> 0).toMap)
    assert(dlqSeq.collect { case (id, "RetryableError", rc, _) => (id, rc) }
      .toMap == exhausted.map(_ -> 3).toMap)
    assert(dlqSeq.forall(_._4 == "orders"), "DLQ provenance must ride along")
    // And the main side went through the sink's real commit protocol:
    // one batch-write commit per micro-batch, none aborted.
    assert(graft.sources.GraftSinkRegistry.commits.get() == 4L,
      "expected one DSv2 sink commit per micro-batch")
    assert(graft.sources.GraftSinkRegistry.aborts.get() == 0L)
  }

  test("Confluent wire survives the streaming DSv2 sink's two-phase " +
      "epoch commit: byte-identical re-decode, replayed epochs idempotent") {
    // r14 verdict №8 — the Kafka-fidelity story short of the jar: the
    // producer shape (key STRING, value BINARY Confluent frame) shipped
    // through a TRANSACTIONAL streaming sink (bytes staged per task,
    // published only at the epoch commit), then re-read downstream and
    // decoded — the wire format must survive the two-phase commit
    // byte for byte.
    import graft.sources.GraftBytesSinkRegistry
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    GraftBytesSinkRegistry.reset()
    val regDir = java.nio.file.Files
      .createTempDirectory("graft-wire-sink-registry").toFile.getAbsolutePath
    val wireJson =
      """{"type":"record","name":"OrderWire","namespace":"graft",
        |"fields":[
        |  {"name":"order_id","type":"long"},
        |  {"name":"product","type":"string"},
        |  {"name":"price_cents","type":"long"}]}""".stripMargin
    val wireId = new graft.streaming.FileSchemaRegistry(regDir)
      .register("orders-value", new org.apache.avro.Schema.Parser()
        .parse(wireJson))
    def framed(df: org.apache.spark.sql.DataFrame) = df.select(
      concat(lit("ORD-"), lpad(col("order_id").cast("string"), 7, "0"))
        .as("key"),
      graft.functions.ToConfluentAvro(
        struct(col("order_id"), col("product"), col("price_cents")),
        regDir, wireId).as("value"))

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-wire-sink").toFile.getAbsolutePath
    val q = framed(spark.readStream.format("graft.sources.OrdersSource")
        .option("rows", "1000").option("parts", "4")
        .option("rowsPerBatch", "250").load())
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("graft.bytes_sink")
    try {
      (1 to 20).takeWhile { _ =>
        q.processAllAvailable()
        GraftBytesSinkRegistry.committed().size < 1000
      }
    } finally q.stop()

    // committed manifest: 4 epochs, every payload exactly once
    assert(GraftBytesSinkRegistry.epochPayloads.size() == 4,
      s"expected 4 committed epochs")
    val committed = GraftBytesSinkRegistry.committed()
    assert(committed.size == 1000)
    assert(GraftBytesSinkRegistry.replayedEpochs.get() == 0L)
    assert(GraftBytesSinkRegistry.aborts.get() == 0L)

    // BYTE-IDENTICAL across the commit: re-encode the same ids batch-side
    // with the same expression; every committed frame must match its key's
    // expected bytes exactly (magic byte, id, Avro payload — all of it).
    val expected = framed(read(1000, 4)).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(committed.map(_._1).toSet == expected.keySet)
    committed.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, expected(k)),
        s"wire bytes for $k changed through the epoch commit") }

    // ...and the downstream CONSUMER decodes the committed bytes back to
    // the source rows through the registry (unframe → writer schema by
    // id → Avro decode).
    import spark.implicits._
    val decoded = committed.map(_._2).toDF("value")
      .select(graft.functions.FromConfluentAvro(
        col("value"), regDir, wireJson).as("o"))
      .select("o.order_id", "o.product", "o.price_cents")
    val want = read(1000, 4).select("order_id", "product", "price_cents")
    assert(decoded.except(want).isEmpty && want.except(decoded).isEmpty,
      "decoded committed payloads must equal the source rows")

    // Epoch replay (checkpoint recovery re-delivering a finished epoch's
    // commit): the published manifest is untouched, the replay counted.
    val someKey = GraftBytesSinkRegistry.epochPayloads.keys()
      .asScala.next()
    val before = GraftBytesSinkRegistry.epochPayloads.get(someKey)
    GraftBytesSinkRegistry.publishEpoch(someKey._1, someKey._2,
      Array(("DUP", Array[Byte](1, 2, 3))))
    assert(GraftBytesSinkRegistry.epochPayloads.get(someKey) eq before,
      "replayed epoch must not replace committed payloads")
    assert(GraftBytesSinkRegistry.replayedEpochs.get() == 1L)
    assert(GraftBytesSinkRegistry.committed().size == 1000)
    // A DIFFERENT query committing the same epoch NUMBER is a distinct
    // key, not a replay — concurrent writers never shadow each other.
    GraftBytesSinkRegistry.publishEpoch("other-query", someKey._2,
      Array(("OTHER", Array[Byte](9))))
    assert(GraftBytesSinkRegistry.replayedEpochs.get() == 1L,
      "another query's epoch must not count as a replay")
    assert(GraftBytesSinkRegistry.committed().size == 1001)
  }

  test("DISTINCT aggregates decline pushdown and stay correct") {
    val df = read(10000, 4)
      .groupBy("product").agg(countDistinct("price_cents").as("n"))
    plannedScan(df) match {
      case _: graft.sources.OrdersScan => // declined — raw scan feeds Spark's agg
      case other => fail(s"expected raw OrdersScan for DISTINCT, got $other")
    }
    val expected = (0L until 10000L)
      .groupBy(graft.sources.OrdersSource.product)
      .map { case (p, ids) =>
        (p, ids.map(graft.sources.OrdersSource.priceCents).distinct.size.toLong) }
      .toSet
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSet == expected)
  }

  test("batch scans read COLUMNAR; runtime-filtered and row paths agree") {
    // The vectorized seam: the batch plan consumes ColumnarBatches
    // (plan shows the scan as columnar — no per-row conversion under
    // the aggregate), and every value matches the row reader's
    // deterministic generators.
    val df = read(10000, 4)
    val plan = df.queryExecution.executedPlan
    val scan = plan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec"))
    assert(scan.supportsColumnar, "batch scan should report columnar support")

    val agg = df.agg(
      count(lit(1)), sum("order_id"), sum("price_cents"),
      countDistinct("product")).collect()(0)
    assert(agg.getLong(0) == 10000L)
    assert(agg.getLong(1) == (0L until 10000L).sum)
    assert(agg.getLong(2) ==
      (0L until 10000L).map(graft.sources.OrdersSource.priceCents).sum)
    // Sampled row-content parity with the scalar generators.
    val row = df.filter(col("order_id") === 1234L)
      .select("product", "price_cents").collect()(0)
    assert(row.getString(0) == graft.sources.OrdersSource.product(1234L))
    assert(row.getLong(1) == graft.sources.OrdersSource.priceCents(1234L))
  }

  test("limit pushdown prunes generation to the head of the slice") {
    // Bare LIMIT: the scan's consumed bounds shrink to [0, 7) — the
    // other readers plan empty slices instead of generating rows a
    // LocalLimit would discard. Partial pushdown: Spark's own limit
    // stays above as the correctness net.
    val df = read(10000, 8).limit(7)
    assert(pushedBounds(df) == (0L, 7L))
    assert(df.select("order_id").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 7L))

    // Composed with a pushed filter: bounds narrow to filter-lo + n.
    val filtered = read(10000, 8).filter(col("order_id") >= 6000).limit(5)
    assert(pushedBounds(filtered) == (6000L, 6005L))
    assert(filtered.select("order_id").collect().map(_.getLong(0)).sorted.toSeq
      == (6000L until 6005L))
  }

  test("top-n pushdown serves the ordered head or tail of the id space") {
    val asc = read(10000, 8).orderBy(col("order_id")).limit(5)
    assert(pushedBounds(asc) == (0L, 5L))
    assert(asc.select("order_id").collect().map(_.getLong(0)).toSeq
      == (0L until 5L))

    val desc = read(10000, 8).orderBy(col("order_id").desc).limit(5)
    assert(pushedBounds(desc) == (9995L, 10000L))
    assert(desc.select("order_id").collect().map(_.getLong(0)).toSeq
      == (9999L to 9995L by -1))

    // A non-key ordering must decline: full bounds, Spark sorts.
    val other = read(10000, 8).orderBy(col("price_cents")).limit(5)
    assert(pushedBounds(other) == (0L, 10000L))
    assert(other.count() == 5)
  }
}
