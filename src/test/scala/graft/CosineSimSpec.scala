package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CosineSim, DotConst}

/** The codegen'd vector kernels must be BIT-identical to the HOF
  * formulations they replaced — the DuckDB oracles assume that fold
  * order. Checked on the real embeddings, both element types.
  */
class CosineSimSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("cosine-sim-spec", cores = "4")

  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("CosineSim is bit-identical to the zip_with/aggregate fold") {
    val e = Tables.embeddings(spark, sf)
    val pairs = e.as("a").join(e.as("b"),
      col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 40)
    val hof = hofDot(col("a.embedding"), col("b.embedding")) /
      sqrt(hofDot(col("a.embedding"), col("a.embedding"))) /
      sqrt(hofDot(col("b.embedding"), col("b.embedding")))
    val diff = pairs.select(
      CosineSim(col("a.embedding"), col("b.embedding")).as("fast"),
      hof.as("ref"))
      .filter(not(col("fast") === col("ref"))) // bit equality, not epsilon
      .count()
    assert(diff == 0)
  }

  test("CosineSim handles double-typed arrays (centroids)") {
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("dbl"))
    val diff = e.select(
      CosineSim(col("embedding"), col("dbl")).as("fast"),
      (hofDot(col("embedding"), col("dbl")) /
        sqrt(hofDot(col("embedding"), col("embedding"))) /
        sqrt(hofDot(col("dbl"), col("dbl")))).as("ref"))
      .filter(not(col("fast") === col("ref")))
      .count()
    assert(diff == 0)
  }

  test("non-array inputs fail analysis instead of reading garbage bytes") {
    val e = Tables.embeddings(spark, sf)
    // CosineSim on a string column must be an analysis-time type error
    // (checkInputDataTypes), not a silent wrong answer at runtime.
    val ex = intercept[Exception] {
      e.select(CosineSim(col("vec_id").cast("string"), col("embedding")))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("cosine_sim") ||
      ex.getMessage.toLowerCase.contains("data type mismatch"))
    val ex2 = intercept[Exception] {
      e.select(DotConst(col("label"), Seq(1.0, 2.0))).collect()
    }
    assert(ex2.getMessage.toLowerCase.contains("dot_const") ||
      ex2.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("DotConst equals a literal-array HOF dot") {
    val w = Array.tabulate(64)(k => math.sin(k * 1.7) / 2)
    val wLit = array(w.map(lit): _*)
    val diff = Tables.embeddings(spark, sf).limit(100)
      .select(
        DotConst(col("embedding"), w).as("fast"),
        hofDot(col("embedding"), wLit).as("ref"))
      .filter(not(col("fast") === col("ref")))
      .count()
    assert(diff == 0)
  }
}
