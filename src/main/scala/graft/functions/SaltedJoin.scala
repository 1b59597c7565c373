package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigating join: salt the skewed (fact) side into `salts`
  * sub-keys and replicate the small (dim) side across every salt, so one
  * hot key spreads over `salts` reducer partitions instead of melting a
  * single task.
  *
  * AQE's skew-join split handles sort-merge cases at runtime; explicit
  * salting remains the tool when the skew is extreme or when the
  * aggregation itself (not just the join) needs to spread — the classic
  * 100 TB "one user is 10% of events" situation.
  */
object SaltedJoin {

  /** Equi-join fact⋈dim on `key`, fact side salted `salts` ways. The dim
    * is replicated ×salts (keep it broadcast-sized). Result equals the
    * plain inner join, row for row.
    */
  def join(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Deterministic spread: hash every fact column, not a RNG — same
    // result on retry/replay (speculative tasks, stage retries).
    val saltCol = pmod(hash(fact.columns.map(col).toSeq: _*), lit(salts))
    val saltedFact = fact.withColumn("__salt", saltCol)
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact
      .join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop(saltedDim(key))
      .drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for heavily skewed keys —
    * partial aggregate on (key, salt), then final on key. The partial
    * shuffle spreads a hot key over `salts` partitions.
    */
  def countBySkewedKey(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__salt", pmod(hash(df.columns.map(col).toSeq: _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("partial_count"))
      .groupBy(col(key))
      .agg(sum("partial_count").as("n"))
  }
}
