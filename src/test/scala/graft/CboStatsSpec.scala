package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer seam: ANALYZE TABLE column statistics change
  * the physical plan. Catalog statistics are the cluster-side answer
  * to "how does the planner know the filtered dimension is small" —
  * at 100 TB nobody sizes broadcast sides by hand; the nightly ANALYZE
  * (or the write-path stats collection) feeds filter-selectivity
  * estimation, and the SAME query text flips from a shuffle join to a
  * broadcast join. This spec pins that seam end to end on the in-memory
  * catalog: external parquet tables (no data copied, no warehouse
  * writes), CBO + join-selectivity estimation on, a fixed
  * autoBroadcastJoinThreshold between the no-stats estimate (raw file
  * size — a Filter does not shrink the size-only estimate) and the
  * with-stats estimate (rowCount × output width × selectivity).
  */
class CboStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("cbo-stats-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("ANALYZE column stats flip a selective dim join to broadcast") {
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      // Between the no-stats estimate (file size scaled by the pruned
      // column ratio only — a range Filter does not shrink it; ~7.3 KB
      // here) and the with-stats estimate (rowCount x range selectivity
      // x output width; ~0.9 KB — the histogram prices the slice
      // almost exactly).
      "spark.sql.autoBroadcastJoinThreshold" -> "4096")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
      spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
      spark.sql(
        s"CREATE TABLE cbo_orders USING parquet LOCATION '$dir/orders.parquet'")
      spark.sql(
        s"CREATE TABLE cbo_lineitem USING parquet LOCATION '$dir/lineitem.parquet'")

      def q = spark.sql(
        """SELECT count(*) AS n
          |FROM cbo_lineitem l
          |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
          |WHERE o.o_totalprice < 20000""".stripMargin)

      // No statistics: the range filter cannot shrink the size-only
      // estimate, so the dim side prices over threshold and shuffles.
      val before = q
      val planBefore = before.queryExecution.sparkPlan.toString
      assert(planBefore.contains("SortMergeJoin"),
        s"expected shuffle join without stats, got:\n$planBefore")
      val nBefore = before.collect()(0).getLong(0)

      spark.sql(
        "ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS")

      // Same query text: filter-selectivity estimation now prices the
      // urgent slice under the broadcast threshold.
      val after = q
      val planAfter = after.queryExecution.sparkPlan.toString
      assert(planAfter.contains("BroadcastHashJoin"),
        s"expected broadcast join with stats, got:\n$planAfter")
      assert(after.collect()(0).getLong(0) == nBefore)
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
      spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("dataset caching swaps the scan for InMemoryTableScan and back") {
    // The interactive-reuse seam: persist() registers the plan with
    // the CacheManager, so ANY dataset with the same analyzed plan —
    // not just the persisted instance — plans an InMemoryTableScan
    // instead of re-reading parquet; unpersist() restores the file
    // scan. Plans are read off FRESH Dataset instances each time
    // (queryExecution is memoized per instance).
    import org.apache.spark.sql.functions.{count, lit}
    def q = Tables.orders(spark, dir)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val expected = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap

    val handle = q.persist()
    try {
      handle.count() // materialize
      val cachedPlan = q.queryExecution.executedPlan.toString
      assert(cachedPlan.contains("InMemoryTableScan"),
        s"expected cached scan, got:\n$cachedPlan")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        == expected)
    } finally handle.unpersist(blocking = true)

    val uncachedPlan = q.queryExecution.executedPlan.toString
    assert(!uncachedPlan.contains("InMemoryTableScan"))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      == expected)
  }
}
