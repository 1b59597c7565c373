package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's producer as a distributed generator
  * (reference: src/producer/kafka_order_producer.py:73-110 — product
  * catalog, per-product price ranges, ORD-%04d keys).
  *
  * Randomness is md5-hash-derived from the sequence number, so the same
  * n yields the same orders on any cluster, any partitioning, any retry —
  * a generator a 100 TB load test can trust. Built on spark.range, it
  * parallelizes across executors with no driver loop.
  */
object OrderProducer {

  /** (product, minPrice, maxPrice) — kafka_order_producer.py:78-96. */
  val catalog: Seq[(String, Double, Double)] = Seq(
    ("Laptop", 799.99, 1999.99),
    ("Mouse", 19.99, 79.99),
    ("Keyboard", 39.99, 149.99),
    ("Monitor", 199.99, 799.99),
    ("Headphones", 49.99, 299.99),
    ("Webcam", 39.99, 149.99),
    ("USB Cable", 5.99, 19.99),
    ("External Drive", 59.99, 249.99),
    ("Mouse Pad", 9.99, 39.99),
    ("Docking Station", 99.99, 299.99))

  /** Uniform-ish [0,1) double from a salted md5 of the id. */
  private def unit(salt: String) =
    expr(s"CAST(conv(substr(md5(concat('$salt', CAST(id AS STRING))), 1, 12), 16, 10) AS BIGINT)") /
      lit(2.81474976710656e14) // 2^48

  /** Decorate a frame holding a LONG `id` column into order events —
    * works identically on `spark.range` (batch) and a renamed streaming
    * `rate` source (`value` → `id`), so the same generator serves load
    * tests in both modes. */
  def decorate(ids: DataFrame,
      startMs: Long = 1704067200000L, intervalMs: Long = 500L): DataFrame = {
    val productIdx = (unit("p") * catalog.size).cast("int")
    val product = catalog.map(_._1).zipWithIndex.foldLeft(lit(null: String)) {
      case (acc, (name, i)) => when(productIdx === i, lit(name)).otherwise(acc)
    }
    val lo = catalog.map(_._2).zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (v, i)) => when(productIdx === i, lit(v)).otherwise(acc)
    }
    val hi = catalog.map(_._3).zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (v, i)) => when(productIdx === i, lit(v)).otherwise(acc)
    }
    ids.select(
      concat(lit("ORD-"), lpad(col("id").cast("string"), 4, "0")).as("orderId"),
      product.as("product"),
      // round to cents like the reference's round(uniform(lo, hi), 2)
      (round((lo + unit("v") * (hi - lo)) * 100, 0) / 100).as("price"),
      (lit(startMs) + col("id") * intervalMs).as("eventTimeMs"))
  }

  /** n orders starting at startMs, one per interval. Columns match
    * OrderStream.OrderEvent. */
  def generate(spark: SparkSession, n: Long,
      startMs: Long = 1704067200000L, intervalMs: Long = 500L): DataFrame =
    decorate(spark.range(n).toDF("id"), startMs, intervalMs)
}
