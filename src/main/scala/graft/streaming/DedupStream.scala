package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** A streamed document (the daily-crawl record arriving on the wire). */
final case class StreamDoc(doc_id: Long, text: String)

/** STREAMING face of incremental near-dup dedup (verdict r12 №5) — the
  * reference's DLQ-split shape (`avro_order_consumer.py:123-155`)
  * applied to dedup: each micro-batch of arriving documents is
  * shingled, MinHash-banded, probed against the PERSISTED history band
  * index with the ≥2-band rule, exact-Jaccard-verified against the
  * history doc-set artifact, and routed — fresh documents to the main
  * (accept) sink, near-duplicates of the index to the dup sink with
  * provenance. The probe stage is [[Dedup.probeVerdicts]], the SAME
  * code the batch operator (`q_incremental_minhash`) runs, so the
  * streaming verdicts cannot drift from the batch semantics
  * (DedupStreamSpec pins exact equality across ≥2 micro-batches).
  *
  * Scale shape: the history index is built ONCE per corpus (and keyed
  * on the corpus fingerprint, so a re-crawled history rebuilds it);
  * per micro-batch work is batch-sized — the band probe ships the
  * KB-sized banded batch to the partitioned index, never the reverse.
  */
object DedupStream {

  /** (band index, doc sets) parquet paths for `dir`'s HISTORY side —
    * doc_id % 5 != 4, the same ingest split the batch operator uses.
    * Build-once per (corpus content, JVM); [[graft.Indexes]]
    * discipline. */
  private val historyIxCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private[graft] def historyIndexPaths(spark: SparkSession,
      dir: String): (String, String) =
    graft.Indexes.corpusCached(historyIxCache, dir)(onEvict = {
      case (b, s) =>
        graft.sources.SnapshotCatalog.deleteTree(java.nio.file.Paths.get(b))
        graft.sources.SnapshotCatalog.deleteTree(java.nio.file.Paths.get(s))
    }, build = {
      val bands = java.nio.file.Files
        .createTempDirectory("graft-hist-bands").toFile.getAbsolutePath
      val sets = java.nio.file.Files
        .createTempDirectory("graft-hist-sets").toFile.getAbsolutePath
      val histEx = Dedup.shingleIndex(spark, dir)
        .filter(col("doc_id") % 5 =!= 4)
      Dedup.bandTableOf(histEx).write.mode("overwrite").parquet(bands)
      Dedup.docSetsOf(histEx).write.mode("overwrite").parquet(sets)
      (bands, sets)
    })

  /** foreachBatch splitter: route each micro-batch's fresh docs to
    * `newSink` and near-dups of the history index to `dupSink`, each
    * dup carrying (best_match, n_matches) provenance. Use with
    * `docStream.writeStream.foreachBatch(dedupSplit(spark, dir, m, d))`.
    * A document producing zero shingles (empty text) gets no verdict
    * and is routed to neither sink — identical to the batch operator,
    * whose verdict base is the shingle index. */
  def dedupSplit(spark: SparkSession, dir: String,
      newSink: (DataFrame, Long) => Unit,
      dupSink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    val (bandsPath, setsPath) = historyIndexPaths(spark, dir)
    (batch: DataFrame, batchId: Long) => {
      val s = batch.sparkSession
      graft.functions.Shingles.register(s)
      val batchEx = batch
        .select(col("doc_id"), explode(expr("shingles(text)")).as("shingle"))
      val verdicts = Dedup.probeVerdicts(batchEx,
        s.read.parquet(bandsPath), s.read.parquet(setsPath)).cache()
      try {
        val routed = batch.join(verdicts, "doc_id")
        newSink(routed.filter(col("verdict") === "new")
          .select("doc_id", "text"), batchId)
        dupSink(routed.filter(col("verdict") =!= "new")
          .select(col("doc_id"), col("text"), col("best_match"),
            col("n_matches"),
            lit("near_dup_of_index").as("reason")), batchId)
      } finally verdicts.unpersist()
    }
  }
}
