package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CODEGEN ↔ INTERPRETED parity for every custom Catalyst expression:
  * each one ships BOTH an `eval`/`nullSafeEval` path and a `doGenCode`
  * path, and Spark picks per-context (whole-stage codegen in the hot
  * path, interpreted under codegen fallback, in BroadcastNestedLoopJoin
  * conditions, and on codegen compile errors). A divergence between the
  * two paths is a silent wrong-answer bug that ordinary query tests
  * cannot catch — they only ever exercise whichever path the planner
  * happened to pick. This spec runs the same expression workload under
  * forced CODEGEN_ONLY and forced NO_CODEGEN (+ whole-stage off) and
  * requires identical rows.
  */
class CodegenParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  @transient lazy val spark: SparkSession =
    GraftSession.create("codegen-parity-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  private def collectUnder(conf: Map[String, String])(
      build: => DataFrame): Seq[String] = {
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try build.collect().map(_.toString).sorted.toSeq
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def assertParity(name: String)(build: => DataFrame): Unit = {
    val gen = collectUnder(Map(
      "spark.sql.codegen.wholeStage" -> "true",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY"))(build)
    val interp = collectUnder(Map(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN"))(build)
    assert(gen.nonEmpty, s"$name: workload returned no rows")
    assert(gen == interp,
      s"$name: codegen and interpreted paths disagree\n" +
        s"codegen: ${gen.take(3)}\ninterp: ${interp.take(3)}")
  }

  private def embPairs: DataFrame = {
    val e = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 20)
    e.as("a").join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.vec_id").as("i"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"))
  }

  test("CosineSim parity") {
    assertParity("CosineSim")(embPairs.select(col("i"),
      round(graft.functions.CosineSim(col("ea"), col("eb")), 6)))
  }

  test("DotConst parity") {
    val w = Seq.tabulate(64)(k => (k % 5 - 2) / 2.0)
    assertParity("DotConst")(embPairs.select(col("i"),
      round(graft.functions.DotConst(col("ea"), w), 6)))
  }

  test("LshBands parity") {
    val planes = Seq.tabulate(16)(p =>
      Seq.tabulate(64)(k => ((p * 64 + k) % 7 - 3) / 3.0))
    assertParity("LshBands")(embPairs.select(col("i"),
      graft.functions.LshBands(col("ea"), planes, 4)))
  }

  test("L2Sq parity") {
    assertParity("L2Sq")(embPairs
      .select(col("i"),
        expr("transform(ea, x -> CAST(round(x * 100, 0) AS BIGINT))").as("qa"),
        expr("transform(eb, x -> CAST(round(x * 100, 0) AS BIGINT))").as("qb"))
      .select(col("i"), graft.functions.L2Sq(col("qa"), col("qb"))))
  }

  test("SortedIntersectSize parity") {
    assertParity("SortedIntersectSize")(
      Tables.part(spark, sfDir).filter(col("p_partkey") < 50)
        .select(col("p_partkey"),
          expr("sequence(CAST(p_partkey % 7 AS BIGINT)," +
            " CAST(p_partkey % 7 + 10 AS BIGINT))").as("sa"),
          expr("sequence(CAST(p_size AS BIGINT)," +
            " CAST(p_size + 10 AS BIGINT))").as("sb"))
        .select(col("p_partkey"),
          graft.functions.SortedIntersectSize(col("sa"), col("sb"))))
  }

  test("HilbertIndex parity") {
    assertParity("HilbertIndex")(
      Tables.part(spark, sfDir).filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          graft.functions.HilbertIndex(
            (col("p_partkey") % 1024).cast("long"),
            (col("p_size") * 31 % 1024).cast("long"))))
  }

  test("Shingles / ShinglesAll parity") {
    graft.functions.Shingles.register(spark)
    graft.functions.ShinglesAll.register(spark)
    assertParity("Shingles")(
      Tables.documents(spark, sfDir).filter(col("doc_id") < 50)
        .selectExpr("doc_id", "shingles(text, 3) AS sh",
          "shingles_all(text, 4) AS sha"))
  }

  test("OptimizerBarrier parity") {
    assertParity("OptimizerBarrier")(
      Tables.part(spark, sfDir).filter(col("p_partkey") < 50)
        .select(col("p_partkey"),
          graft.functions.OptimizerBarrier(
            col("p_partkey") * 3 + length(col("p_name")))))
  }

  test("Avro encode/decode round-trip parity") {
    graft.functions.AvroOrder.register(spark)
    assertParity("AvroOrder")(
      Tables.orders(spark, sfDir).filter(col("o_orderkey") < 200)
        .selectExpr(
          "to_avro_order(named_struct(" +
            "'orderId', CAST(o_orderkey AS STRING)," +
            "'product', o_orderpriority," +
            "'price', CAST(o_totalprice AS FLOAT)," +
            "'timestamp', unix_micros(CAST(o_orderdate AS TIMESTAMP))))" +
            " AS avro_bytes")
        .selectExpr("md5(avro_bytes) AS digest",
          "from_avro_order(avro_bytes) AS back",
          "try_from_avro_order(CAST('garbage' AS BINARY)) AS corrupt"))
  }

  test("Confluent framed encode/registry decode parity") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-parity-registry").toFile.getAbsolutePath
    val reg = new graft.streaming.FileSchemaRegistry(d)
    val v1 = reg.register("orders-value", graft.functions.AvroOrder.schema)
    val v2 = reg.register("orders-value",
      graft.functions.AvroOrder.schemaV2)
    assertParity("ConfluentOrderCodec")(
      Tables.orders(spark, sfDir).filter(col("o_orderkey") < 200)
        .select(
          when(col("o_orderkey") % 2 === 0,
            graft.functions.ToConfluentOrderV1(expr(
              "named_struct('orderId', CAST(o_orderkey AS STRING)," +
                "'product', o_orderpriority," +
                "'price', CAST(o_totalprice AS FLOAT)," +
                "'timestamp', unix_micros(CAST(o_orderdate AS TIMESTAMP)))"
            ), v1))
            .otherwise(graft.functions.ToConfluentOrderV2(expr(
              "named_struct('orderId', CAST(o_orderkey AS STRING)," +
                "'product', o_orderpriority," +
                "'price', CAST(o_totalprice AS DOUBLE)," +
                "'timestamp', unix_micros(CAST(o_orderdate AS TIMESTAMP))," +
                "'currency', 'EUR')"), v2)).as("wire"))
        .select(md5(col("wire")).as("digest"),
          graft.functions.FromConfluentOrder(col("wire"), d).as("back")))
  }
}
