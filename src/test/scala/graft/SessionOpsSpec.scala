package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, OlapQueries, Sessionize, Stats}

/** Invariant pins for the late-round operators — properties the DuckDB
  * hash check implies but never states: conservation laws (bridges add
  * up, partitions cover), leakage guarantees, and hard value bounds.
  * Each would catch a whole class of silent arithmetic or partitioning
  * regressions with one assert.
  */
class SessionOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("session-ops-spec", cores = "4")

  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("revenue waterfall bridges add up exactly") {
    val r = OlapQueries.revenueWaterfall(spark, sf).collect()(0)
    val (gross, disc, net, tax, charge) =
      (r.getAs[Long]("gross_e6"), r.getAs[Long]("discount_e6"),
        r.getAs[Long]("net_e6"), r.getAs[Long]("tax_e6"),
        r.getAs[Long]("charge_e6"))
    assert(gross - disc == net)
    assert(net + tax == charge)
    assert(disc >= 0 && tax >= 0 && net > 0)
  }

  test("revenue Lorenz deciles partition customers; cum share ends at 1") {
    val rows = Stats.revenueLorenz(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nCust)
    val last = rows.maxBy(_.getAs[Int]("decile"))
    assert(last.getAs[Long]("cum_share_ppm") == 1000000L)
    // Descending-spend deciles: shares must be non-increasing.
    val shares = rows.sortBy(_.getAs[Int]("decile"))
      .map(_.getAs[Long]("share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
  }

  test("k-fold assignment never splits a near-dup cluster across folds") {
    // The leakage guarantee itself, asserted directly: recompute the
    // cluster -> fold mapping and demand one fold per cluster.
    val labels = Dedup.ccLabels(spark, sf)
    val perCluster = Tables.documents(spark, sf).select("doc_id")
      .join(labels, col("doc_id") === col("node"), "left")
      .select(coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("fold", expr(
        "CAST(conv(substr(md5(CAST(cluster_id AS STRING)), 1, 8)," +
          " 16, 10) AS BIGINT) % 5"))
      .groupBy("cluster_id").agg(countDistinct("fold").as("nf"))
    assert(perCluster.filter(col("nf") > 1).isEmpty)
    // And the report partitions the corpus.
    val total = Dedup.kfoldSplit(spark, sf)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("interval coverage respects per-user hard bounds") {
    val w = 300L // seconds per event window
    val bad = Sessionize.intervalCoverage(spark, sf)
      .filter(col("covered_seconds") < w ||
        col("covered_seconds") > col("n_events") * w)
    assert(bad.isEmpty,
      "union length must lie in [window, n_events * window]")
  }

  test("RFM scores stay in 1..5 and each axis partitions customers") {
    val rows = Stats.rfmSegments(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    for (r <- rows; ccol <- Seq("r_score", "f_score", "m_score")) {
      val s = r.getAs[Int](ccol)
      assert(s >= 1 && s <= 5, s"$ccol out of range: $s")
    }
  }

  test("t-closeness: TVD stays in [0,1], deciles partition every record") {
    val rows = graft.operators.Profiling.tCloseness(spark, sf).collect()
    val nCust = Tables.customer(spark, sf).count()
    // Conservation: the decile histogram covers every record exactly once.
    assert(rows.map(_.getAs[Long]("n_records")).sum == nCust)
    for (r <- rows) {
      val d = r.getAs[Long]("tvd_decile")
      assert(d >= 0 && d <= 10, s"TVD decile out of [0,10]: $d")
      // Past-t mass can never exceed the bucket's own record mass, and
      // buckets fully below t = 0.2 (ppm 200000 => decile <= 1) carry none.
      assert(r.getAs[Long]("records_past_t") <= r.getAs[Long]("n_records"))
      if (d < 2) assert(r.getAs[Long]("records_past_t") == 0,
        s"decile $d is below t yet flags records")
      if (d >= 3) assert(r.getAs[Long]("records_past_t") ==
        r.getAs[Long]("n_records"),
        s"decile $d is entirely past t yet flags fewer records")
    }
  }

  test("conformal intervals: calibration coverage hits the split-conformal law") {
    val rows = Stats.conformalInterval(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("lo_micro") <= r.getAs[Long]("yhat_micro"))
      assert(r.getAs[Long]("yhat_micro") <= r.getAs[Long]("hi_micro"))
    }
    val cal = rows.filter(_.getAs[Boolean]("is_cal"))
    val k = ((cal.length + 1) * 9 + 9) / 10
    val covered = cal.count(_.getAs[Long]("covered") == 1L)
    // q is the k-th smallest calibration residual, so it covers at
    // least k calibration points (exactly k when residuals are
    // distinct) — the finite-sample guarantee split conformal is for.
    assert(covered >= k,
      s"calibration coverage $covered < conformal k=$k of ${cal.length}")
  }

  test("randomized response: debiased estimates conserve the population") {
    val rows = graft.operators.Profiling.randResponse(spark, sf).collect()
    val n = Tables.customer(spark, sf).count()
    val k = rows.length
    assert(rows.map(_.getAs[Long]("n_true")).sum == n)
    assert(rows.map(_.getAs[Long]("n_obs")).sum == n,
      "the mechanism must emit exactly one report per record")
    // Σ n̂_i = Σ (4k·obs_i − n)/(3k) = (4k·n − k·n)/(3k) = n exactly;
    // the per-segment floor loses < 1 milli each.
    val estSum = rows.map(_.getAs[Long]("est_milli")).sum
    assert(math.abs(estSum - n * 1000L) <= k,
      s"debias must conserve the population: Σest=$estSum vs ${n * 1000L}")
    // err_milli is literally est − true in milli.
    for (r <- rows)
      assert(r.getAs[Long]("err_milli") ==
        r.getAs[Long]("est_milli") - r.getAs[Long]("n_true") * 1000L)
  }
}
