package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order layout: the Morton code must interleave correctly, and a
  * z-clustered write must give per-file bounding boxes that let a
  * two-column box predicate skip most files — the data-skipping
  * property the operator exists for.
  */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("zorder-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.01"

  test("zValue interleaves bits (known vectors)") {
    import spark.implicits._
    // (x, y, morton): x bits land at even positions, y at odd.
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (5L, 0L, 17L),           // 101 -> 1_0_1 at bits 0,2,4
      (0L, 5L, 34L),           // interleaved odd positions = 2*17
      (65535L, 65535L, 4294967295L)) // all 32 bits set
    val got = cases.toDF("x", "y", "want")
      .select(col("want"), ZOrder.zValue(col("x"), col("y")).as("got"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(0),
      s"zValue mismatch: got ${r.getLong(1)}, want ${r.getLong(0)}"))
  }

  /** Files whose footer [min,max] box overlaps the box predicate
    * partkey ∈ [0,127] × suppkey ∈ [0,15] — what a stats-based reader
    * would have to open. */
  private def overlappingFiles(table: DataFrame): (Long, Long) = {
    val stats = table
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("p_lo"), max("l_partkey").as("p_hi"),
        min("l_suppkey").as("s_lo"), max("l_suppkey").as("s_hi"))
    val total = stats.count()
    val overlapping = stats
      .filter(col("p_lo") <= 127 && col("p_hi") >= 0 &&
        col("s_lo") <= 15 && col("s_hi") >= 0)
      .count()
    (overlapping, total)
  }

  test("z-clustered layout skips most files for a box predicate") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val base = Files.createTempDirectory("zorder").toString

    // Baseline: the natural (orderkey-clustered) layout.
    val totalRows = li.count()
    val rowsPerFile = totalRows / 30
    li.repartitionByRange(30, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").option("maxRecordsPerFile", rowsPerFile)
      .parquet(s"$base/by_orderkey")
    val byOrder = spark.read.parquet(s"$base/by_orderkey")

    val byZ = ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey",
      s"$base/by_z", files = 30, knownRows = Some(totalRows))

    val (zHit, zTotal) = overlappingFiles(byZ)
    val (oHit, oTotal) = overlappingFiles(byOrder)
    assert(zTotal >= 25 && oTotal >= 25, s"want ~30 files, got $zTotal/$oTotal")
    // partkey keys are ~uniform per file in the natural layout, so
    // almost every file overlaps the box; the z layout must confine it
    // to a few.
    assert(oHit * 10 >= oTotal * 9,
      s"natural layout should have ~no skipping power ($oHit/$oTotal)")
    assert(zHit * 4 <= zTotal,
      s"z layout should skip >= 3/4 of files, hit $zHit of $zTotal")
    // Same data either way.
    assert(byZ.count() == byOrder.count())
  }
}
