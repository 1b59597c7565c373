package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** THE REFERENCE'S FULL TOPOLOGY AS A LIBRARY SURFACE — the one-job
  * graph `avro_order_consumer.py:60-155` wires, packaged so any entry
  * point (the TopologySpec restart/scale tests, the ScaleNotch 10×
  * main, a production `readStream` swap-in) builds the IDENTICAL
  * chain:
  *
  *   replayable source ("topic") → Confluent-FRAMED mixed-version
  *   bytes (producer leg) → `FromConfluentAvro` decode under the v2
  *   reader → validate → `asRetryEvents` → `RetryExecProcessor`
  *   (state + timers, RocksDB) → terminal `RetryOutcome`s
  *
  * The source contract is a directory of JSON files standing in for a
  * Kafka topic's retained log (replayable across checkpoint restarts);
  * a real Kafka deployment swaps `readStream.json(dir)` for
  * `readStream.format("kafka")` and drops the producer leg — every
  * operator downstream takes the same DataFrame.
  */
object Topology {

  /** Order-wire schema pair: v2 adds `source` with a default — the
    * LOSSLESS evolution face (an added-default field), so decoded
    * prices stay bit-identical to the batch faces. */
  val wireV1: String =
    """{"type":"record","name":"OrderWire","namespace":"graft",
      |"fields":[
      |  {"name":"event_id","type":"long"},
      |  {"name":"product","type":["null","string"],"default":null},
      |  {"name":"price","type":"double"},
      |  {"name":"ts_ms","type":"long"}]}""".stripMargin

  val wireV2: String =
    """{"type":"record","name":"OrderWire","namespace":"graft",
      |"fields":[
      |  {"name":"event_id","type":"long"},
      |  {"name":"product","type":["null","string"],"default":null},
      |  {"name":"price","type":"double"},
      |  {"name":"ts_ms","type":"long"},
      |  {"name":"source","type":"string","default":"orders-topic"}]}"""
      .stripMargin

  /** Stage an events projection as the replayable JSON "topic":
    * `files` json files = `files` micro-batches under
    * `maxFilesPerTrigger=1`, retained on disk like a Kafka log so a
    * restarted checkpoint can re-read any offset range. */
  def stageTopic(events: DataFrame, srcDir: String, files: Int = 4): Unit =
    events
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
      .repartition(files)
      .write.mode("overwrite").json(srcDir)

  /** The topology's source→frame→decode→validate→retry chain: staged
    * json "topic" → mixed-version Confluent frames (even ids v1, odd
    * v2) → one v2-reader decode → canonical orders → `asRetryEvents` →
    * `RetryExecProcessor`. `regSpec` is either a registry directory or
    * an `http(s)://` registry URL — the codec dispatches by spec. */
  def outcomeStream(spark: SparkSession, srcDir: String, regSpec: String,
      v1Id: Int, v2Id: Int, delayMs: (String, Int) => Long)
      : Dataset[OrderStream.RetryOutcome] = {
    val raw = spark.readStream
      .schema("event_id LONG, event_type STRING, value DOUBLE, ts LONG")
      .option("maxFilesPerTrigger", 1)
      .json(srcDir)
    val v1Struct = struct(col("event_id"),
      col("event_type").as("product"), col("value").as("price"),
      expr("ts div 1000000").as("ts_ms"))
    val v2Struct = struct(col("event_id"),
      col("event_type").as("product"), col("value").as("price"),
      expr("ts div 1000000").as("ts_ms"),
      lit("orders-topic-v2").as("source"))
    val wire = raw.select(
      when(col("event_id") % 2 === 0,
        graft.functions.ToConfluentAvro(v1Struct, regSpec, v1Id))
        .otherwise(graft.functions.ToConfluentAvro(v2Struct, regSpec, v2Id))
        .as("wire"))
    val orders = wire
      .select(graft.functions.FromConfluentAvro(
        col("wire"), regSpec, wireV2).as("o"))
      .select(col("o.event_id").cast("string").as("orderId"),
        col("o.product").as("product"), col("o.price").as("price"),
        col("o.ts_ms").as("eventTimeMs"))
    OrderStream.retryExecutorTws(
      OrderStream.asRetryEvents(orders), 3, delayMs)
  }

  /** Outcome-sink schema (what the parquet outcome sink writes). */
  val outSchema: String = "event_id STRING, product STRING, price DOUBLE," +
    " route STRING, retry_count INT, error_type STRING," +
    " error_message STRING, scheduled_ms LONG, emitted_ms LONG," +
    " event_ms LONG"
}
