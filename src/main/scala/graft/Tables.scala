package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All operators take an `sfDir` so the same code runs at any scale factor;
  * on a real cluster the same paths would be object-store URIs and the
  * parquet scans would be partition-pruned / predicate-pushed identically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless
    // read as a raw long (epoch nanos). Reading nanos as long is also the
    // lossless choice — converting to TimestampType would truncate to
    // micros. Set here (idempotent, dynamic conf) so every entry point
    // (Verify, Bench, tests, driver-owned sessions) gets it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** Session factory with the scale-oriented defaults used everywhere
  * (tests, Verify, Bench). AQE handles runtime skew/coalescing; the
  * shuffle-partition count matches the local core count but would be
  * raised (or left to AQE) on a real cluster.
  */
object GraftSession {
  def create(appName: String = "graft", cores: String = "*"): SparkSession = {
    // Default to every core on the box (the driver runs local[32]); the
    // env var stays as an override for constrained runs.
    val cpus =
      if (cores == "*")
        sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors.toString)
      else cores
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // A multi-query run compiles hundreds of codegen units; the default
      // 100-entry generated-class cache evicts under that, and every
      // evicted stage recompiles inside janino's global lock — with 32
      // task threads that serializes the whole pool. Size it to hold the
      // full workload.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
