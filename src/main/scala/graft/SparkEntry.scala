package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's whole consumer path in one plan — events → Avro
    * encode/decode (custom codec expressions) → validate → per-product
    * price stats, i.e. what the Kafka consumer + PriceAggregator compute,
    * as a single declarative Spark query.
    */
  def entry(spark: SparkSession): DataFrame =
    StreamQueries.avroRoundtrip(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (OrderAnalytics.queries, OrderAnalytics.oracles),
      (Reliability.queries, Reliability.oracles),
      (OlapQueries.queries, OlapQueries.oracles),
      (StreamQueries.queries, StreamQueries.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Sessionize.queries, Sessionize.oracles),
      (AsofJoin.queries, AsofJoin.oracles),
      (Sampling.queries, Sampling.oracles),
      (Packing.queries, Packing.oracles),
      (Analytics.queries, Analytics.oracles),
      (Profiling.queries, Profiling.oracles),
      (CorpusPipeline.queries, CorpusPipeline.oracles),
      (CorpusClean.queries, CorpusClean.oracles),
      (ZOrder.queries, ZOrder.oracles),
      (Stats.queries, Stats.oracles),
      (Ranking.queries, Ranking.oracles),
      (GraphOps.queries, GraphOps.oracles),
      (graft.sources.OrdersSource.queries, graft.sources.OrdersSource.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
