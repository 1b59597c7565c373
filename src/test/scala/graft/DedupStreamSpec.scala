package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DedupStream, StreamDoc}

/** Streaming face of incremental near-dup dedup (verdict r12 №5): a
  * foreachBatch stage shingles each micro-batch, probes the PERSISTED
  * history band index, and routes new/dup verdicts to split sinks. The
  * contract: across ≥2 micro-batches, the union of routed verdicts is
  * EXACTLY the batch operator's (`q_incremental_minhash`) — same docs,
  * same verdicts, same best-match provenance.
  */
class DedupStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  @transient lazy val spark: SparkSession =
    GraftSession.create("dedup-stream-spec", cores = "2")

  override def afterAll(): Unit = spark.stop()

  test("2-micro-batch streamed verdicts equal the batch operator exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // The batch operator's verdict table: doc -> (verdict, n, best).
    val expected = operators.Dedup.incrementalMinhash(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(expected.nonEmpty && expected.values.exists(_._1 == "new") &&
      expected.values.exists(_._1 == "near_dup_of_index"),
      s"test needs both verdict kinds in the batch result: $expected")

    // Stream the SAME arriving slice (doc_id % 5 == 4) in two
    // micro-batches.
    val arriving = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .as[StreamDoc].collect().sortBy(_.doc_id).toSeq
    val (firstHalf, secondHalf) = arriving.splitAt(arriving.size / 2)
    assert(firstHalf.nonEmpty && secondHalf.nonEmpty)

    val accepted = new java.util.concurrent.ConcurrentLinkedQueue[Row]
    val dupes = new java.util.concurrent.ConcurrentLinkedQueue[Row]
    val batchIds = new java.util.concurrent.ConcurrentLinkedQueue[Long]

    val input = MemoryStream[StreamDoc]
    val q = input.toDF().writeStream
      .foreachBatch(DedupStream.dedupSplit(spark, sfDir,
        (df: DataFrame, id: Long) => {
          batchIds.add(id); df.collect().foreach(accepted.add)
        },
        (df: DataFrame, id: Long) => df.collect().foreach(dupes.add)))
      .start()
    try {
      input.addData(firstHalf: _*)
      q.processAllAvailable()
      input.addData(secondHalf: _*)
      q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    assert(batchIds.asScala.toSet.size >= 2,
      s"expected >= 2 micro-batches, saw ids ${batchIds.asScala.toSet}")

    val streamed =
      accepted.asScala.map(r =>
        r.getAs[Long]("doc_id") -> (("new", 0L, -1L))).toMap ++
      dupes.asScala.map(r => r.getAs[Long]("doc_id") ->
        (("near_dup_of_index", r.getAs[Long]("n_matches"),
          r.getAs[Long]("best_match")))).toMap
    assert(streamed == expected,
      s"streamed verdicts drifted from the batch operator:\n" +
        s"only-streamed: ${streamed.toSet -- expected.toSet}\n" +
        s"only-batch:    ${expected.toSet -- streamed.toSet}")

    // Split-sink provenance: every dup row names a real history doc.
    assert(dupes.asScala.forall { r =>
      r.getAs[Long]("best_match") % 5 != 4 &&
        r.getAs[String]("reason") == "near_dup_of_index"
    })
  }
}
