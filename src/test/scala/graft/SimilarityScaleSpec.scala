package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Scale posture of the brute-force similarity baselines: the
  * all-pairs vector-count guard must be transparent under the cap
  * (identical output) and refuse LOUDLY over it — mirroring
  * DedupScaleSpec's df-cap test, per the round-10 verdict. The
  * production paths (annLshNearDup/annIvf/annPq/semDedup) never take
  * the guarded joins.
  */
class SimilarityScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("similarity-scale-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("embedding all-pairs baseline refuses past the vec cap, transparent under it") {
    // Under the default cap the guard is invisible: assert_true -> null
    // -> isNull true keeps every row, so the baseline's pair set is
    // unchanged (the correctness sweep hash-checks it). Over the cap it
    // must FAIL at runtime, not enumerate n² pairs: cap=1 makes any
    // 2-vector corpus hot.
    val under = Similarity.embeddingNearDup(spark, sfDir).count()
    assert(under > 0)
    spark.conf.set("spark.graft.allPairsVecCap", "1")
    try {
      val e = intercept[Exception] {
        Similarity.embeddingNearDup(spark, sfDir).count()
      }
      assert(msgs(e).exists(_.contains("annLshNearDup")),
        s"guard failure must name the subquadratic alternative, got: $e")
      val e2 = intercept[Exception] {
        Similarity.bitextMining(spark, sfDir).count()
      }
      assert(msgs(e2).exists(_.contains("spark.graft.allPairsVecCap")),
        s"bitext guard must name the override conf, got: $e2")
    } finally spark.conf.unset("spark.graft.allPairsVecCap")
    // And back under the cap the guarded baseline still answers the same.
    assert(Similarity.embeddingNearDup(spark, sfDir).count() == under)
  }

  test("annTopK guards its query side: wide query sets refuse, k-NN unchanged under cap") {
    val under = Similarity.annTopK(spark, sfDir).count()
    assert(under > 0)
    spark.conf.set("spark.graft.allPairsVecCap", "1")
    try {
      val e = intercept[Exception] {
        Similarity.annTopK(spark, sfDir).count()
      }
      assert(msgs(e).exists(_.contains("annTopK query set")),
        s"guard failure must name the guarded operator, got: $e")
      val e2 = intercept[Exception] {
        Similarity.hardNegatives(spark, sfDir).count()
      }
      assert(msgs(e2).exists(_.contains("hardNegatives")),
        s"hardNegatives guard must fire too, got: $e2")
    } finally spark.conf.unset("spark.graft.allPairsVecCap")
    assert(Similarity.annTopK(spark, sfDir).count() == under)
  }

  test("probe sweep: recall is monotone in nprobe and hits 1.0 at full probe") {
    // More probed cells can only ADD scored candidates, so recall@10
    // must be non-decreasing in nprobe per query — the contract the
    // serving knob is turned against. At nprobe = #cells the IVF scan
    // is exhaustive over non-self vectors, so recall must be exactly
    // 10⁶ ppm (the exact top-10 is a subset of an exhaustive scan).
    val sweep = Similarity.probeSweep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    val byQuery = sweep.groupBy(_._1)
    assert(byQuery.nonEmpty)
    for ((q, rows) <- byQuery) {
      val recalls = rows.sortBy(_._2).map(_._3)
      assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
        s"query $q: recall not monotone in nprobe: ${recalls.toSeq}")
    }
    val cells = Similarity.ivfCentroids(spark, sfDir).count().toInt
    val full = Similarity.annRecallOf(spark, sfDir, probes = cells)
    full.collect().foreach { r =>
      assert(r.getAs[Long]("recall_ppm") == 1000000L,
        s"full-probe IVF must be exhaustive: $r")
    }
  }

  test("embedding audit counts duplicates and zero dimensions") {
    // The natural testdata has no duplicate vectors and no zero dims,
    // so the sweep's hash-check never exercises those columns — this
    // constructed frame does: vecs 0 and 2 are byte-identical (one dup,
    // keeper = min id), vec 1 is all-zero (64 zero dims, norm² bucket
    // length(bin(0)) = 1).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val v = Seq.fill(64)(0.5f)
    val z = Seq.fill(64)(0.0f)
    val emb = Seq((0L, v), (1L, z), (2L, v))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"))
    val rows = Similarity.embeddingAuditFrom(emb)
      .orderBy("bucket").collect()
    assert(rows.length == 2)
    val zeroB = rows(0)
    assert(zeroB.getAs[Int]("bucket") == 1 &&
      zeroB.getAs[Long]("n_vectors") == 1 &&
      zeroB.getAs[Long]("n_zero_dims") == 64 &&
      zeroB.getAs[Long]("n_dup_vectors") == 0)
    val mainB = rows(1)
    // 500² · 64 = 16,000,000 → bin length 24; dup = vec 2 (not 0)
    assert(mainB.getAs[Long]("n_vectors") == 2 &&
      mainB.getAs[Long]("n_dup_vectors") == 1 &&
      mainB.getAs[Long]("n_zero_dims") == 0 &&
      mainB.getAs[Long]("min_norm2") == 16000000L)
  }
}
