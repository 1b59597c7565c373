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

  test("qsketch_level and qsketch_agg resolve in plain SQL and match " +
      "the Scala faces (r15 verdict: SQL-surface the sketch family)") {
    // Scalar face: SQL qsketch_level ≡ QuantileSketch.level on the
    // boundary cases — 0 (→32), powers of two, and inputs ABOVE the
    // 32-bit domain, which after the mask fix agree with the
    // relational Σ-of-divisibility replay.
    val lv = spark.sql(
      """SELECT h, qsketch_level(h) AS l FROM VALUES
        |  (0L), (1L), (6L), (1024L), (2147483648L),
        |  (4294967296L), (8589934592L), (4294967300L)
        |AS t(h)""".stripMargin).collect()
    lv.foreach { r =>
      assert(r.getInt(1) == graft.functions.QuantileSketch.level(r.getLong(0)),
        s"qsketch_level(${r.getLong(0)})")
    }
    assert(lv.find(_.getLong(0) == 0L).get.getInt(1) == 32)
    assert(lv.find(_.getLong(0) == 4294967296L).get.getInt(1) == 32)

    // Aggregate face: SQL GROUP BY over qsketch_agg ≡ the typed
    // Aggregator run through the Dataset API on identical rows — the
    // same (t, retained items) per group, k small enough that trims
    // really fire.
    import spark.implicits._
    val rows = (1L to 4000L).map { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h32 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      (if (id % 2 == 0) "g0" else "g1", id % 997L, h32, id)
    }
    rows.toDF("grp", "cents", "h32", "row_id")
      .createOrReplaceTempView("qsk_in")
    val viaSql = spark.sql(
      """SELECT grp, qsketch_agg(cents, h32, row_id, 64) AS sk
        |FROM qsk_in GROUP BY grp""".stripMargin)
      .collect().map { r =>
        val sk = r.getStruct(1)
        r.getString(0) -> (sk.getInt(0),
          sk.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))))
      }.toMap
    val qa = graft.functions.QuantileSketch.agg(64)
    val viaDs = rows.toDS()
      .groupByKey(_._1).mapValues(t => (t._2, t._3, t._4))
      .agg(qa.toColumn).collect()
      .map { case (g, sk) => g -> sk }.toMap
    assert(viaSql.keySet == Set("g0", "g1"))
    assert(viaSql == viaDs,
      s"SQL qsketch_agg diverged from the typed Aggregator")
    assert(viaSql.values.forall(_._1 > 0), "k=64 over 2000 rows must trim")
  }

  test("qsketch_agg rejects a bad k LOUDLY at build time " +
      "(r16 advice №2): non-constant, non-positive, non-integer") {
    // k parameterizes the Aggregator instance, so it must be a
    // positive integer literal; each misuse must surface as an
    // IllegalArgumentException carrying the usage string, never the
    // opaque NPE/ClassCastException eval() used to throw.
    spark.range(4).selectExpr("id AS cents", "id AS h32", "id AS row_id")
      .createOrReplaceTempView("qsk_badk")
    def expectBad(sql: String, fragment: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      val all = msgs(e).mkString(" | ")
      assert(all.contains("qsketch_agg(cents, h32, row_id[, k])"),
        s"must carry the usage string, got: $all")
      assert(all.contains(fragment), s"expected '$fragment' in: $all")
    }
    expectBad(
      "SELECT qsketch_agg(cents, h32, row_id, cents) FROM qsk_badk",
      "non-constant")
    expectBad(
      "SELECT qsketch_agg(cents, h32, row_id, 0) FROM qsk_badk", "k = 0")
    expectBad(
      "SELECT qsketch_agg(cents, h32, row_id, -5) FROM qsk_badk", "k = -5")
    expectBad(
      "SELECT qsketch_agg(cents, h32, row_id, 'lots') FROM qsk_badk",
      "k = lots")
    // And the happy path still resolves with a literal k.
    assert(spark.sql(
      "SELECT qsketch_agg(cents, h32, row_id, 8) FROM qsk_badk")
      .collect().length == 1)
  }
}
