package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The capstone composite: an end-to-end training-corpus preprocessing
  * pass — language filter → quality gate → exact dedup (keep smallest
  * doc_id) → deterministic sample → per-source accounting. This is the
  * pipeline shape a 100 TB corpus actually runs nightly; each stage is
  * one of the §2.3 operators, composed in a single declarative plan so
  * Catalyst fuses the narrow stages and the only shuffles are the dedup
  * hash-agg and the final rollup.
  */
object CorpusPipeline {

  def preprocess(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(col("text")), "\\s+")
    val docs = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(toks))
      // language filter + quality gate
      .filter(col("lang").isin("en", "es", "fr"))
      .filter(col("n_tokens") >= 20 && col("n_tokens") <= 1000)
      // exact dedup: keep the smallest doc_id per normalized content hash
      .withColumn("content_hash",
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
    val keep = docs.groupBy("content_hash")
      .agg(min("doc_id").as("doc_id"))
    docs.join(keep, Seq("content_hash", "doc_id"), "left_semi")
      // deterministic 50% sample by hash bucket
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
      .filter(col("bucket") < 50)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"))
  }

  /** Corpus data card: the one-table release summary accompanying a
    * training dataset (docs, languages, sources, token volume, exact-dup
    * and near-dup rates) — every value an exact integer so the card is
    * bit-reproducible. Each metric is an independent aggregate; Spark
    * runs them as parallel jobs over the shared scans and the union is
    * driver-free. */
  def corpusDatacard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = split(lower(col("text")), "\\s+")
    def metric(name: String, v: org.apache.spark.sql.Column): DataFrame =
      docs.agg(v.cast("long").as("value")).select(lit(name).as("metric"), col("value"))
    val base = Seq(
      metric("n_docs", count(lit(1))),
      metric("n_langs", countDistinct(col("lang"))),
      metric("n_sources", countDistinct(col("source"))),
      metric("total_chars", sum(col("n_chars").cast("long"))),
      metric("total_ws_tokens", sum(size(toks).cast("long"))),
      metric("exact_dup_docs",
        count(lit(1)) - countDistinct(
          md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))))
    val nearDups = Dedup.dedupMinhash(spark, dir)
      .agg(count(lit(1)).cast("long").as("value"))
      .select(lit("near_dup_pairs").as("metric"), col("value"))
    (base :+ nearDups).reduce(_ unionAll _)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_pipeline" -> preprocess,
    "q_corpus_datacard" -> corpusDatacard)

  val oracles: Map[String, String] = Map(
    "q_corpus_datacard" ->
      s"""SELECT 'n_docs' AS metric, count(*) AS value FROM documents
         |UNION ALL SELECT 'n_langs', count(DISTINCT lang) FROM documents
         |UNION ALL SELECT 'n_sources', count(DISTINCT source) FROM documents
         |UNION ALL SELECT 'total_chars', CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) FROM documents
         |UNION ALL SELECT 'total_ws_tokens',
         |  CAST(sum(CAST(length(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT)) AS BIGINT)
         |  FROM documents
         |UNION ALL SELECT 'exact_dup_docs',
         |  count(*) - count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))))
         |  FROM documents
         |UNION ALL SELECT 'near_dup_pairs',
         |  (SELECT count(*) FROM (${Dedup.jaccardPairsSql}) jp WHERE jaccard >= 0.8)"""
        .stripMargin,
    "q_corpus_pipeline" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |         CAST(length(regexp_split_to_array(lower(text), '\s+')) AS INT) AS n_tokens,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
        |  FROM documents
        |  WHERE lang IN ('en', 'es', 'fr')),
        |gated AS (
        |  SELECT * FROM base WHERE n_tokens BETWEEN 20 AND 1000),
        |kept AS (
        |  SELECT g.* FROM gated g
        |  JOIN (SELECT content_hash, min(doc_id) AS doc_id
        |        FROM gated GROUP BY content_hash) k
        |    ON g.content_hash = k.content_hash AND g.doc_id = k.doc_id),
        |sampled AS (
        |  SELECT * FROM kept
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50)
        |SELECT source,
        |       count(*) AS n_docs,
        |       CAST(sum(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
        |       min(doc_id) AS min_doc_id,
        |       max(doc_id) AS max_doc_id
        |FROM sampled GROUP BY source""".stripMargin)
}
