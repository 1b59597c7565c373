package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hidden file-metadata columns (`_metadata.file_path` /
  * `row_index`) — the built-in row-level PROVENANCE seam: at 100 TB,
  * "which file did this bad row come from, and at what offset" is the
  * difference between re-ingesting one object and re-ingesting a
  * prefix. The columns come from the scan itself (no extra shuffle, no
  * join against a listing), so a quarantine/repair pass can carry
  * provenance for free.
  */
class FileMetadataSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("file-metadata-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  test("_metadata exposes per-row file provenance on a partitioned lake") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-meta").toFile.getAbsolutePath
    val events = Tables.events(spark, dir)
      .select("event_id", "event_type", "user_id")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)

    val withMeta = spark.read.parquet(out)
      .select(col("event_id"), col("event_type"),
        col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))

    // Every row's file sits under its own partition directory — the
    // provenance column and the partition value can never disagree.
    assert(withMeta
      .filter(!col("fp").contains(concat(lit("event_type="),
        col("event_type")))).isEmpty)

    // row_index is the exact in-file offset: per file it is the dense
    // range [0, n): min 0, max n-1, all distinct.
    val perFile = withMeta.groupBy("fp")
      .agg(count(lit(1)).as("n"), min("ri").as("lo"), max("ri").as("hi"),
        countDistinct("ri").as("d"))
      .collect()
    assert(perFile.nonEmpty)
    perFile.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
      assert(r.getAs[Long]("d") == r.getAs[Long]("n"))
    }

    // Nothing lost or duplicated through the provenance projection.
    assert(withMeta.count() == events.count())
  }

  test("dynamic partition pruning reaches the partitioned parquet lake") {
    // The lake face of the DSv2 runtime-filtering row: a selective dim
    // filter, known only at run time, prunes fact PARTITIONS — the
    // plan carries a dynamicpruning expression in PartitionFilters and
    // the scan reads one directory instead of five. At 100 TB this is
    // the difference between scanning the day/type you need and
    // scanning the lake.
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-dpp").toFile.getAbsolutePath
    Tables.events(spark, dir).select("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val dimOut = Files.createTempDirectory("graft-dpp-dim")
      .toFile.getAbsolutePath
    // The dim filter must be a COMPARISON: DPP's isLikelySelective
    // heuristic does not count a bare boolean attribute (a
    // `=== true` filter constant-folds to one) as selective, and
    // silently declines — a real migration gotcha worth pinning.
    Tables.events(spark, dir).select("event_type").distinct()
      .withColumn("category",
        when(col("event_type") === "purchase", "conversion")
          .otherwise("browse"))
      .write.mode("overwrite").parquet(dimOut)

    val fact = spark.read.parquet(out)
    val dim = spark.read.parquet(dimOut)
      .filter(col("category") === "conversion")
    val q = fact.join(dim, "event_type")
    val planned = q.queryExecution.executedPlan.toString
    assert(planned.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter, got:\n$planned")
    val expected = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(q.count() == expected)
  }
}
