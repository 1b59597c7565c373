package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Parquet FILE-LEVEL BLOOM FILTERS — the lake feature beyond min/max
  * zone maps (q_skipping_report's face): min/max prunes RANGE
  * predicates but is useless for point lookups on high-cardinality
  * unsorted keys (every row group spans the whole id domain); a bloom
  * filter per column chunk answers "is key k possibly here" and lets
  * the reader skip row groups min/max cannot. This spec pins the
  * write-side contract on this build: the option actually lands a
  * bloom filter in the footer (offset present), a plain write lands
  * none, and a point-lookup over the bloom-filtered file returns the
  * same rows — at 100 TB this is the difference between scanning
  * every row group of an id-keyed fact and touching ~one.
  */
class ParquetBloomSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("parquet-bloom-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  private def bloomOffsets(dir: String, column: String): Seq[Long] = {
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getAbsolutePath),
      new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      reader.getFooter.getBlocks.asScala.flatMap(b =>
        b.getColumns.asScala
          .filter(_.getPath.toDotString == column)
          .map(_.getBloomFilterOffset)).toSeq
    } finally reader.close()
  }

  test("bloom option writes a footer bloom filter; plain write does not") {
    val root = Files.createTempDirectory("graft_parquet_bloom")
    val (withBloom, without) =
      (root.resolve("with").toString, root.resolve("without").toString)
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"))
    df.coalesce(1).write
      .option("parquet.bloom.filter.enabled#doc_id", "true")
      .option("parquet.bloom.filter.expected.ndv#doc_id", "10000")
      .mode("overwrite").parquet(withBloom)
    df.coalesce(1).write.mode("overwrite").parquet(without)

    val offs = bloomOffsets(withBloom, "doc_id")
    assert(offs.nonEmpty && offs.forall(_ > 0),
      s"bloom-enabled write must record bloom filter offsets, got $offs")
    val plain = bloomOffsets(without, "doc_id")
    assert(plain.forall(_ <= 0),
      s"plain write must NOT record bloom filter offsets, got $plain")

    // Point lookup parity: the bloom-filtered file serves the same rows.
    val k = df.agg(min("doc_id")).collect()(0).getLong(0)
    val got = spark.read.parquet(withBloom)
      .filter(col("doc_id") === k).collect()
    val want = df.filter(col("doc_id") === k).collect()
    assert(got.toSeq == want.toSeq, "lookup over bloom file must match")
  }
}
