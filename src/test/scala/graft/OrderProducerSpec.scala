package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{OrderProducer, OrderStream}

/** Producer fidelity + end-to-end produce→process→DLQ-JSON-sink flow
  * (the reference writes DLQ messages as JSON; dead_letter_queue_consumer
  * reads them back).
  */
class OrderProducerSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("order-producer-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  test("rate source drives the producer decoration live") {
    // readStream.format("rate") -> the same decoration the batch
    // generator uses -> validated aggregate in a memory sink: the
    // continuous-load-test face of the producer.
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 500).load()
    val orders = OrderProducer.decorate(rate.select(col("value").as("id")))
    val q = OrderStream.validate(orders)
      .filter(col("is_valid"))
      .groupBy("product").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("rate_orders")
      .outputMode("complete").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var rows = 0L
      while (rows == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        rows = spark.table("rate_orders").count()
      }
      assert(rows > 0)
      val products = spark.table("rate_orders")
        .collect().map(_.getString(0)).toSet
      assert(products.subsetOf(OrderProducer.catalog.map(_._1).toSet))
    } finally q.stop()
  }

  test("producer is deterministic and respects the catalog price ranges") {
    val a = OrderProducer.generate(spark, 1000).collect().map(_.toString).sorted
    val b = OrderProducer.generate(spark, 1000).collect().map(_.toString).sorted
    assert(a.sameElements(b))

    val ranges = OrderProducer.catalog.map(c => c._1 -> (c._2, c._3)).toMap
    OrderProducer.generate(spark, 1000).collect().foreach { r =>
      val (lo, hi) = ranges(r.getString(1))
      val price = r.getDouble(2)
      assert(price >= lo - 0.005 && price <= hi + 0.005,
        s"${r.getString(1)} price $price outside [$lo, $hi]")
      assert(r.getString(0).matches("ORD-\\d{4}"))
    }
    // every product appears with 1000 draws
    val products = OrderProducer.generate(spark, 1000)
      .select("product").distinct().count()
    assert(products == OrderProducer.catalog.size)
  }

  test("produce -> validate -> DLQ JSON sink round-trips like the reference") {
    val tmp = Files.createTempDirectory("graft-dlq").toFile
    val valid = new java.io.File(tmp, "valid")
    val dlq = new java.io.File(tmp, "dlq")

    // inject failures the way the reference sees them: bad price + an
    // 'error' product
    val orders = OrderProducer.generate(spark, 200)
      .withColumn("price",
        when(col("orderId") === "ORD-0007", lit(-1.0)).otherwise(col("price")))
      .withColumn("product",
        when(col("orderId") === "ORD-0013", lit("error")).otherwise(col("product")))

    OrderStream.dlqSplit(
      (v: DataFrame, _: Long) => v.write.mode("overwrite").json(valid.getAbsolutePath),
      (d: DataFrame, _: Long) => d.write.mode("overwrite").json(dlq.getAbsolutePath)
    )(orders, 0L)

    val validBack = spark.read.json(valid.getAbsolutePath)
    val dlqBack = spark.read.json(dlq.getAbsolutePath)
    // ORD-0013 is retryable and recovers on retry 1
    // (Reliability.recoverAttempt), so the executor-faithful split
    // routes it to MAIN with its TRUE retry count; only the permanent
    // ORD-0007 reaches the DLQ, unretried.
    assert(graft.operators.Reliability.recoverAttempt("ORD-0013") == 1)
    assert(validBack.count() == 199)
    assert(dlqBack.count() == 1)
    val recovered = validBack.filter(col("orderId") === "ORD-0013").collect()
    assert(recovered.length == 1 &&
      recovered.head.getAs[Long]("retry_count") == 1L)
    val byId = dlqBack.collect()
      .map(r => r.getAs[String]("orderId") -> r).toMap
    assert(byId("ORD-0007").getAs[String]("error_class") == "PermanentError")
    assert(byId("ORD-0007").getAs[Long]("retry_count") == 0L)
    assert(dlqBack.columns.contains("original_topic") &&
      dlqBack.columns.contains("consumer_group"))
  }
}
