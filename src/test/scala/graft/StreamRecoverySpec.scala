package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery / exactly-once delivery: the property the
  * reference approximates with `enable.idempotence` + consumer offsets,
  * stated here as Structured Streaming's source-offset + file-sink-log
  * contract. A file-source stream is stopped and restarted against the
  * same checkpoint across three scenarios (new data, no data, repeated
  * restart) — every input order must land in the sink exactly once.
  */
class StreamRecoverySpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("stream-recovery-spec", cores = "2")

  override def afterAll(): Unit = spark.stop()

  private def writeBatch(dir: Path, name: String, ids: Range): Unit = {
    val rows = ids.map { i =>
      s"""{"orderId":"ORD-$i","product":"P${i % 3}","price":${i % 50 + 1}.50,"timestamp":${1704067200000L + i * 1000}}"""
    }
    Files.write(dir.resolve(name), rows.mkString("\n").getBytes)
  }

  test("restart from checkpoint delivers every order exactly once") {
    val root = Files.createTempDirectory("graft_recovery")
    val (src, sink, chk) =
      (root.resolve("src"), root.resolve("sink"), root.resolve("chk"))
    Files.createDirectories(src)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("orderId STRING, product STRING, price DOUBLE, timestamp LONG")
        .json(src.toString)
        .withColumn("price_cents", round(col("price") * 100, 0).cast("long"))
        .writeStream
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", chk.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sinkIds(): Seq[String] = {
      val files = sink.toFile.listFiles()
      if (files == null || !files.exists(_.getName.endsWith(".parquet"))) Seq.empty
      else spark.read.parquet(sink.toString)
        .select("orderId").collect().map(_.getString(0)).toSeq
    }

    writeBatch(src, "b1.json", 0 until 40)
    runOnce()
    assert(sinkIds().sorted == (0 until 40).map(i => s"ORD-$i").sorted)

    // restart with NEW files: only the delta is processed
    writeBatch(src, "b2.json", 40 until 70)
    runOnce()
    val afterB2 = sinkIds()
    assert(afterB2.size == 70 && afterB2.distinct.size == 70)

    // restart with NO new data: nothing is reprocessed
    runOnce()
    runOnce()
    val afterIdle = sinkIds()
    assert(afterIdle.size == 70 && afterIdle.distinct.size == 70)
  }

  test("state store reader introspects a streaming aggregation checkpoint") {
    // Spark 4's State Data Source: a stopped query's state store read
    // back as a DataFrame — the operational seam for state debugging,
    // capacity audits ("how many keys is this query carrying?") and
    // offline state repair, with no need to replay the stream. The
    // reference's consumer keeps its per-product aggregation state
    // opaque inside the process; here the same state is a queryable
    // table.
    val root = Files.createTempDirectory("graft_statestore")
    val (src, chk) = (root.resolve("src"), root.resolve("chk"))
    Files.createDirectories(src)
    writeBatch(src, "b1.json", 0 until 60) // products P0, P1, P2
    val q = spark.readStream
      .schema("orderId STRING, product STRING, price DOUBLE, timestamp LONG")
      .json(src.toString)
      .groupBy("product")
      .agg(count(lit(1)).as("n"),
        sum(round(col("price") * 100, 0).cast("long")).as("cents"))
      .writeStream
      .format("memory").queryName("state_reader_agg")
      .option("checkpointLocation", chk.toString)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val state = spark.read.format("statestore")
      .load(chk.toString)
    // One state row per aggregation key; the key struct carries the
    // grouping columns.
    val keys = state.select(col("key.product")).collect()
      .map(_.getString(0)).toSeq.sorted
    assert(keys == Seq("P0", "P1", "P2"),
      s"state keys must be the grouping keys, got $keys")
    // The value struct is the aggregation buffer — its count field must
    // agree with a batch recompute over the same input.
    val countField = state.select(col("value.*")).schema.fields
      .find(_.name.toLowerCase.contains("n")).map(_.name)
    val expected = spark.read
      .schema("orderId STRING, product STRING, price DOUBLE, timestamp LONG")
      .json(src.toString)
      .groupBy("product").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    countField.foreach { f =>
      val got = state
        .select(col("key.product").as("p"), col(s"value.`$f`").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"state buffer $f must match recompute: $got vs $expected")
    }
  }

  test("maxFilesPerTrigger bounds micro-batch size under AvailableNow") {
    // Ingestion BACKPRESSURE: a catch-up run over a large backlog must
    // not load the whole backlog into one micro-batch (state + shuffle
    // sized to the backlog instead of the trigger). maxFilesPerTrigger
    // caps each batch; AvailableNow honors it while still draining
    // everything — the bounded-catch-up contract a 100 TB backfill
    // relies on.
    val root = Files.createTempDirectory("graft_ratelimit")
    val (src, chk) = (root.resolve("src"), root.resolve("chk"))
    Files.createDirectories(src)
    writeBatch(src, "b1.json", 0 until 10)
    writeBatch(src, "b2.json", 10 until 20)
    writeBatch(src, "b3.json", 20 until 30)
    val batchSizes =
      new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = spark.readStream
      .schema("orderId STRING, product STRING, price DOUBLE, timestamp LONG")
      .option("maxFilesPerTrigger", "1")
      .json(src.toString)
      .writeStream
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) => { batchSizes.put(id, df.count()); () }
      }
      .option("checkpointLocation", chk.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.values.toSeq
    assert(sizes.sum == 30, s"every order drains exactly once: $sizes")
    assert(sizes.count(_ > 0) >= 3 && sizes.forall(_ <= 10),
      s"each micro-batch must hold at most one file's rows: $sizes")
  }

  test("RocksDB state store: aggregation state persists across restart") {
    // The at-scale state backend: HDFSBackedStateStoreProvider keeps
    // every key on the JVM heap (state size is bounded by executor
    // memory — the thing that falls over first on a 10⁸-key streaming
    // aggregation), RocksDB spills to local disk with incremental
    // checkpointing. Same query contract, one config switch — this
    // test pins (a) the provider actually engages on this build and
    // (b) state written by a RocksDB-backed run is recovered by a
    // SECOND run from the same checkpoint: the restart face of the
    // large-state deployment story.
    val root = Files.createTempDirectory("graft_rocksdb")
    val (src, chk) = (root.resolve("src"), root.resolve("chk"))
    Files.createDirectories(src)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = root.resolve("out").toString
      def runOnce(): Unit = {
        // memory sink cannot recover a checkpoint; foreachBatch can —
        // each update-mode micro-batch appends its changed keys, and
        // max(n) per key reads back the (monotone) final count.
        val q = spark.readStream
          .schema("orderId STRING, product STRING, price DOUBLE, timestamp LONG")
          .json(src.toString)
          .groupBy("product")
          .agg(count(lit(1)).as("n"))
          .writeStream
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) => df.write.mode("append").parquet(out)
          }
          .option("checkpointLocation", chk.toString)
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      writeBatch(src, "b1.json", 0 until 50)
      runOnce()
      // restart with new data: per-key counts must CARRY the run-1
      // state (50 + 40 records → 30 per product), proving the RocksDB
      // files in the checkpoint were loaded, not rebuilt from scratch.
      writeBatch(src, "b2.json", 50 until 90)
      runOnce()
      val got = spark.read.parquet(out)
        .groupBy("product").agg(max("n").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("P0" -> 30L, "P1" -> 30L, "P2" -> 30L),
        s"RocksDB-backed state must accumulate across restart, got $got")
      // The checkpoint really is RocksDB-format: the state store
      // reader loads it back under the same provider config.
      val state = spark.read.format("statestore").load(chk.toString)
      assert(state.count() == 3, "one RocksDB state row per product")
    } finally spark.conf.unset(
      "spark.sql.streaming.stateStore.providerClass")
  }
}
