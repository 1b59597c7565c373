package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the loud-failure contract of the correctness dump: a query
  * that throws leaves a `_verify_error` marker parquet in its output
  * slot and an entry in the collected error map — never a silently
  * missing row. (Round 8 shipped 20 broken queries because failures
  * used to vanish; this spec keeps the guardrail honest.)
  */
class VerifySpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("verify-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  test("a throwing query writes a _verify_error marker and records the error") {
    val out = Files.createTempDirectory("graft-verify-spec").toFile.getAbsolutePath
    val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("deliberate test failure")
    Verify.runOne(spark, "/nonexistent", out, "q_boom", boom, errors)
    assert(errors.containsKey("q_boom"))
    assert(errors.get("q_boom").contains("deliberate test failure"))
    val marker = spark.read.parquet(s"$out/q_boom")
    assert(marker.columns.toSeq == Seq("_verify_error"))
    assert(marker.count() == 1)
    assert(marker.head().getString(0).contains("deliberate test failure"))
  }

  test("a healthy query writes its result and records no error") {
    val out = Files.createTempDirectory("graft-verify-spec-ok").toFile.getAbsolutePath
    val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).select(col("id"))
    Verify.runOne(spark, "/unused", out, "q_ok", ok, errors)
    assert(errors.isEmpty)
    assert(spark.read.parquet(s"$out/q_ok").count() == 3)
  }
}
