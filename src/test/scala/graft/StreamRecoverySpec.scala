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
}
