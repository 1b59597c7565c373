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

  test("v2 reader and permissive decode resolve through the extension") {
    val row = spark.sql(
      """SELECT from_avro_order_v2(to_avro_order(named_struct(
        |  'orderId', 'ORD-0000008', 'product', 'Keyboard',
        |  'price', CAST(49.5 AS FLOAT), 'timestamp', 1704067200000))) AS o"""
        .stripMargin)
      .selectExpr("o.orderId", "o.price", "o.currency")
      .collect().head
    assert(row.getString(0) == "ORD-0000008")
    assert(row.getDouble(1) == 49.5f.toDouble) // float→double promotion
    assert(row.getString(2) == "USD")          // defaulted field
    val corrupt = spark.sql(
      "SELECT try_from_avro_order(CAST('nonsense' AS BINARY)) AS o")
      .collect().head
    assert(corrupt.isNullAt(0))
  }

  test("vector/set kernels resolve through the extension in plain SQL") {
    val r = spark.sql(
      """SELECT sorted_intersect_size(array('a', 'b', 'c'), array('b', 'c', 'd')) AS s,
        |       l2sq(array(1L, 2L, 3L), array(4L, 0L, 3L)) AS d""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 13L) // 3² + 2² + 0²
  }

  test("text/vector kernels shingles/shingles_all/cosine_sim resolve in SQL") {
    val r = spark.sql(
      """SELECT shingles('a b a b c', 2) AS sh,
        |       shingles_all('a b a b c', 2) AS sha,
        |       cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
        |                  array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS cs
        |""".stripMargin).collect().head
    assert(r.getSeq[String](0).toSet == Set("a b", "b a", "b c"))
    assert(r.getSeq[String](1) == Seq("a b", "b a", "a b", "b c"))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
  }

  test("round-trip elision removes the codec from the optimized plan") {
    val df = spark.sql(
      """SELECT from_avro_order(to_avro_order(named_struct(
        |  'orderId', CAST(id AS STRING), 'product', 'Laptop',
        |  'price', CAST(id AS FLOAT), 'timestamp', id))).price AS p
        |FROM range(100)""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("from_avro_order") &&
      !optimized.contains("fromavroorder"),
      s"codec not elided:\n$optimized")
    // results unchanged
    assert(df.selectExpr("sum(p)").collect().head.getDouble(0) == 4950.0)
  }

  test("elision does not fire on shape mismatch") {
    // 'price' as DOUBLE (not FLOAT): rule must leave the expression
    // alone and analysis/runtime behave as without the rule.
    val df = spark.sql(
      """SELECT to_avro_order(named_struct(
        |  'orderId', 'x', 'product', 'y',
        |  'price', CAST(1.5 AS FLOAT), 'timestamp', 7)) AS bytes""".stripMargin)
    assert(df.collect().head.getAs[Array[Byte]](0).nonEmpty)
  }
}
