package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The library's spark.sql.extensions entry point registers the SQL
  * functions on a fresh session with no per-session register() call.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .appName("graft-extensions-spec")
    .master("local[2]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("to_avro_order/from_avro_order resolve through the extension") {
    val row = spark.sql(
      """SELECT from_avro_order(to_avro_order(named_struct(
        |  'orderId', 'ORD-0000007', 'product', 'Monitor',
        |  'price', CAST(349.99 AS FLOAT), 'timestamp', 1704067200000))) AS o"""
        .stripMargin)
      .selectExpr("o.orderId", "o.product", "o.price", "o.timestamp")
      .collect().head
    assert(row.getString(0) == "ORD-0000007")
    assert(row.getString(1) == "Monitor")
    assert(row.getFloat(2) == 349.99f)
    assert(row.getLong(3) == 1704067200000L)
  }
}
