package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `events.ts` normalization contract: the engine-facing type
  * is epoch-nanos BIGINT for EVERY physical parquet encoding the
  * driver's testdata has shipped (TIMESTAMP(NANOS) in early rounds,
  * TIMESTAMP_MICROS isAdjustedToUTC=0 later). Round 8 broke 20
  * event-time queries because the normalization only covered NANOS —
  * this spec is the guard that makes the next physical-type swap a
  * red test instead of a silent analysis failure in the field.
  */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("tables-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  test("events.ts loads as epoch-nanos LongType from the driver testdata") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == LongType,
      s"ts must normalize to BIGINT nanos, got ${ev.schema("ts").dataType}")
    // Epoch-nanos sanity: all values inside [2000, 2100) as nanos.
    val row = ev.agg(min("ts"), max("ts")).head()
    val lo = 946684800L * 1000000000L   // 2000-01-01 in epoch nanos
    val hi = 4102444800L * 1000000000L  // 2100-01-01
    assert(row.getLong(0) >= lo && row.getLong(1) < hi,
      s"ts range [${row.getLong(0)}, ${row.getLong(1)}] is not epoch nanos")
  }

  test("micros-timestamp parquet normalizes to the same nanos a NTZ write round-trips") {
    // Write a tiny events-shaped table with a micros TIMESTAMP_NTZ ts
    // (what the r8+ testdata stores), load through Tables, and check
    // the values are exactly micros*1000 — UTC session semantics, no
    // timezone shift, lossless.
    val dir = Files.createTempDirectory("graft-tables-spec").toFile.getAbsolutePath
    import spark.implicits._
    val micros = Seq(0L, 1L, 1723500000000000L, -1000000L)
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
      .select("ts").as[Long].collect().sorted
    assert(got.toSeq == micros.map(_ * 1000L).sorted,
      s"expected micros*1000, got ${got.toSeq}")
  }

  test("a raw-long ts column (legacy nanos-as-long) passes through unchanged") {
    val dir = Files.createTempDirectory("graft-tables-spec-long").toFile.getAbsolutePath
    import spark.implicits._
    val nanos = Seq(0L, 999L, 1723500000000000000L)
    nanos.toDF("ts").withColumn("event_id", lit(1L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir).select("ts").as[Long].collect().sorted
    assert(got.toSeq == nanos.sorted)
  }
}
