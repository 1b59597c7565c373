package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries recall guarantee under skew and distributed merges: any
  * key with frequency > n/k must survive in the sketch summary no
  * matter how partitions merge.
  */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("sketch-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  test("MG summary ⊇ keys with freq > n/k on zipfian data, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // zipf-ish: key_i with weight 1/(i+1), 200 distinct keys, 50k draws
    val weights = (0 until 200).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def draw(): Int = { val x = rnd.nextDouble() * total; cum.indexWhere(x <= _) }
    val items = Seq.fill(50000)(s"k${draw()}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

    for (k <- Seq(5, 10, 50); parts <- Seq(1, 7, 32)) {
      val mg = udaf(graft.functions.HeavyHitters.aggregator(k),
        org.apache.spark.sql.Encoders.STRING)
      val summary = items.toDF("item").repartition(parts)
        .agg(mg(col("item"))).collect()(0).getSeq[String](0).toSet
      val mustHave = exact.collect {
        case (key, n) if n > items.size.toDouble / k => key
      }.toSet
      assert(mustHave.subsetOf(summary),
        s"k=$k parts=$parts missing ${mustHave -- summary}")
      assert(summary.size <= k - 1 || summary.size <= exact.size)
    }
  }

  test("KMV sketch is merge-order independent and tracks exact distincts") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // 5000 draws over ~1200 distinct ids (some repeated) so the sketch
    // operates in its estimating regime (distinct >> k).
    val ids = Seq.fill(5000)(rnd.nextInt(1200).toLong)
    val hashed = ids.toDF("id").selectExpr(
      "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 12), 16, 10) AS BIGINT) AS h")
    val k = 63
    // Merge-order independence: the sketch over any partitioning equals
    // the bottom-k of the globally-sorted distinct hash set.
    val expected = hashed.distinct().orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val du = udaf(graft.functions.KmvSketch.distinctAgg(k),
        org.apache.spark.sql.Encoders.scalaLong)
      val got = hashed.repartition(parts)
        .agg(du(col("h"))).collect()(0).getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
    // Estimator sanity at a larger k (k=63's ±13% σ leaves too much
    // room for an unlucky-but-valid seed — this data sits at 3.5σ
    // there; k=255 concentrates to ±6.3% σ and the same loose-3σ band
    // becomes a meaningful assert): (k−1)·2⁴⁸ / h_k within 3/√(k−1)
    // of the true distinct count.
    val kEst = 255
    val exact = ids.distinct.size
    val estArr = hashed.distinct().orderBy("h").limit(kEst)
      .collect().map(_.getLong(0))
    val est = (kEst - 1).toLong * 281474976710656L / estArr.last
    assert(math.abs(est.toDouble / exact - 1.0) < 3.0 / math.sqrt(kEst - 1.0),
      s"est=$est exact=$exact")
    // Sample face: min-payload rule + bottom-k by hash, any partitioning.
    val pairs = ids.zipWithIndex.map { case (id, i) =>
      (id, (i % 97).toLong) }.toDF("id", "v").selectExpr(
      "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 12), 16, 10) AS BIGINT) AS h",
      "v")
    val minPerH = pairs.groupBy("h").agg(min("v").as("v"))
    val expSample = minPerH.orderBy("h").limit(k)
      .collect().map(_.getLong(1)).toSeq.sorted
    for (parts <- Seq(1, 7, 32)) {
      val sv = udaf(graft.functions.KmvSketch.sampleAgg(k),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
      val got = pairs.repartition(parts)
        .agg(sv(col("h"), col("v"))).collect()(0).getSeq[Long](0)
      assert(got == expSample, s"sample face, parts=$parts")
    }
  }

  test("CMS never undercounts and is merge-order independent (property)") {
    // The two CMS contracts the operator relies on: est(key) >= exact
    // for EVERY key (min over rows of colliding-mass sums), and the
    // sketch is identical no matter how the input is partitioned —
    // exercised directly on the Aggregator (reduce/merge), including a
    // width small enough to force collisions.
    val agg = graft.functions.CountMinSketch.aggregator(4, 32)
    val rnd = new scala.util.Random(7)
    val items = Seq.fill(5000)(s"u${rnd.nextInt(300)}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

    def sketchOf(parts: Int): Seq[Long] = {
      val bufs = items.grouped(math.max(1, items.size / parts))
        .map(chunk => chunk.foldLeft(agg.zero)(agg.reduce)).toList
      agg.finish(bufs.reduce(agg.merge))
    }
    val s1 = sketchOf(1)
    assert(s1 == sketchOf(7) && s1 == sketchOf(32),
      "sketch must be independent of partitioning")
    assert(s1.sum == 4L * items.size, "each row holds the full mass")
    exact.foreach { case (key, n) =>
      val est = (0 until 4).map { d =>
        // same bucket the aggregator uses: window d of md5(key)
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(key.getBytes("UTF-8"))
        val v = ((h(4 * d) & 0xFFL) << 24) | ((h(4 * d + 1) & 0xFFL) << 16) |
          ((h(4 * d + 2) & 0xFFL) << 8) | (h(4 * d + 3) & 0xFFL)
        s1(d * 32 + (v % 32).toInt)
      }.min
      assert(est >= n, s"CMS undercounted $key: est $est < exact $n")
    }
  }

  test("SortedIntersectSize equals array_intersect size on random sorted sets (property)") {
    // The PPJoin verify kernel's contract: for any two duplicate-free
    // ascending string arrays, the merge count equals the engine's own
    // array_intersect cardinality — exercised through SQL so the
    // codegen path (not just nullSafeEval) is what runs. Includes
    // empties, disjoint, identical, prefix-overlap and unicode cases.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = Vector("a", "ab", "abc", "b", "ba", "cc", "d0", "Δδ", "ζ", "z9")
    val cases = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq.empty[String]),
      (alphabet.sorted, alphabet.sorted)) ++
      Seq.fill(200) {
        def randSet() = rnd.shuffle(alphabet).take(rnd.nextInt(alphabet.size + 1))
          .distinct.sorted
        (randSet(): Seq[String], randSet(): Seq[String])
      }
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.SortedIntersectSize(col("x"), col("y")).as("merge_n"),
        size(array_intersect(col("x"), col("y"))).cast("long").as("ref_n"))
    val bad = df.filter(col("merge_n") =!= col("ref_n")).collect()
    assert(bad.isEmpty, s"kernel mismatch: ${bad.take(3).mkString("; ")}")
  }

  test("bitmap aggregator is exact and merge-order independent (property)") {
    val agg = graft.functions.BitmapAgg.aggregator
    val rnd = new scala.util.Random(13)
    val ids = Seq.fill(5000)(rnd.nextInt(1500).toLong)
    def bitmapOf(parts: Int): Seq[Long] = {
      val bufs = ids.grouped(math.max(1, ids.size / parts))
        .map(chunk => chunk.foldLeft(agg.zero)(agg.reduce)).toList
      agg.finish(bufs.reduceLeft(agg.merge))
    }
    val b1 = bitmapOf(1)
    assert(b1 == bitmapOf(7) && b1 == bitmapOf(32),
      "bitmap must be independent of partitioning")
    assert(b1.map(java.lang.Long.bitCount(_).toLong).sum == ids.distinct.size,
      "popcount must equal the exact distinct count")
    // Merging disjoint halves = bitmap of the union.
    val (l, r) = ids.partition(_ < 750)
    val merged = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    assert(merged == b1)
  }

  test("distributed equi-depth histogram equals the single-window ntile form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Exercise n % buckets != 0 (both oracle datasets land on r = 0, so
    // the first-r-buckets-take-one-extra branch of the closed form is
    // only pinned here), n < buckets, ties in the value column, and a
    // partition count that doesn't divide the data evenly.
    val rnd = new scala.util.Random(7)
    for ((n, b) <- Seq((23, 10), (7, 10), (1000, 10), (40, 8))) {
      val df = rnd.shuffle((0 until n).toList)
        .map(i => (i.toLong, (i.toLong * 37) % 101))
        .toDF("o_orderkey", "price_cents")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val got = rows(graft.operators.Profiling
        .equidepthOf(df, "price_cents", "o_orderkey", buckets = b, parts = 5))
      val w = Window.orderBy(col("price_cents"), col("o_orderkey"))
      val ref = rows(df.withColumn("bucket", ntile(b).over(w))
        .groupBy("bucket").agg(count(lit(1)).as("n_orders"),
          min("price_cents").as("lo_cents"),
          max("price_cents").as("hi_cents")))
      assert(got == ref, s"n=$n buckets=$b: $got != $ref")
    }
  }

  test("level-sampling quantile sketch: bounded rank error at 50k rows") {
    import spark.implicits._
    // Uniform cents 1..50k, unique ids — deterministic md5 levels, so
    // the whole run is reproducible and the bounds can be tight-ish.
    val n = 50000L
    val df = spark.range(1, n + 1)
      .select(lit("g").as("grp"), col("id").as("event_id"),
        col("id").as("cents"))
    val est = graft.operators.Profiling.quantileSketchOf(df).collect()
    assert(est.length == 3)
    est.foreach { r =>
      val q = r.getAs[Long]("q_pct"); val v = r.getAs[Long]("est_cents")
      val nEst = r.getAs[Long]("n_est")
      // cents == rank here, so the exact rank error is |v/n − q/100|.
      val errPpm = math.abs(v * 1000000L / n - q * 10000L)
      assert(errPpm <= 60000L, s"q$q est $v err $errPpm ppm")
      assert(math.abs(nEst - n) <= n / 10, s"n_est $nEst vs $n")
      // Sketch really compressed: threshold > 0, ≪ n rows retained.
      assert(r.getAs[Long]("t_star") >= 4 &&
        r.getAs[Long]("n_retained") <= 8 * 128 * 2)
    }
  }

  test("quantile sketch degenerates to the exact ceil-rank quantile " +
    "when everything fits (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf).select(
      col("event_type").as("grp"), col("event_id"),
      expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val est = graft.operators.Profiling.quantileSketchOf(ev).collect()
    val byGrp = ev.collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sorted).toMap
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getAs[Long]("t_star") == 0L) // ≤128/shard ⇒ no sampling
      val vals = byGrp(r.getAs[String]("grp"))
      val q = r.getAs[Long]("q_pct")
      val target = ((q * vals.length + 99) / 100).toInt // ceil rank
      assert(r.getAs[Long]("est_cents") == vals(target - 1),
        s"${r.getAs[String]("grp")} q$q")
    }
  }

  test("quantile sketch Aggregator ≡ batch thresholds under any " +
    "partitioning, through a 3-batch stream, and up to the estimates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val k = 128
    // 40k rows / 2 groups so per-(grp, shard) counts force real trims;
    // h32/shard/level derived by the SAME formulas as the batch SQL.
    val ev = spark.range(1, 40001).select(
      concat(lit("g"), col("id") % 2).as("grp"), col("id").as("event_id"),
      (col("id") % 9973).as("cents"))
    val rows = ev.select(col("grp"), col("event_id"), col("cents"),
      expr("CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10)" +
        " AS BIGINT)").as("h32"))
      // Shared constant, NOT a re-derived divisor (r15 advice): if
      // QSketchShards ever changes, this test must track production's
      // sharding, not silently validate a stale one.
      .withColumn("shard",
        expr(s"h32 div ${graft.operators.Profiling.QSketchShardDiv}"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
      .map { case (g, id, c, h, s) => (g, s, c, h, id) }

    // Independent Scala reference: smallest t with |{ℓ ≥ t}| ≤ k.
    def lvl(h: Long) = graft.functions.QuantileSketch.level(h)
    val ref = rows.groupBy(t => (t._1, t._2)).view.mapValues { items =>
      val t = Iterator.from(0)
        .find(t => items.count(it => lvl(it._4) >= t) <= k).get
      (t, items.filter(it => lvl(it._4) >= t)
        .map(it => (it._3, it._4, it._5)).sorted)
    }.toMap

    val qa = graft.functions.QuantileSketch.agg(k)
    def sketchOf(ds: org.apache.spark.sql.Dataset[(String, Long, Long, Long, Long)]) =
      ds.groupByKey(t => (t._1, t._2)).mapValues(t => (t._3, t._4, t._5))
        .agg(qa.toColumn).collect()
        .map { case (key, sk) => key -> (sk._1, sk._2) }.toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = sketchOf(rows.toDS().repartition(parts))
      assert(got == ref, s"parts=$parts")
    }
    // Trims really fired (state stayed O(k), not O(n)).
    assert(ref.values.forall(v => v._1 >= 3 && v._2.length <= k))

    // The same aggregator as streaming state across 3 micro-batches.
    val input = MemoryStream[(String, Long, Long, Long, Long)]
    val q = input.toDS().groupByKey(t => (t._1, t._2))
      .mapValues(t => (t._3, t._4, t._5)).agg(qa.toColumn)
      .toDF("key", "sketch")
      .writeStream.format("memory").queryName("qsketch_stream")
      .outputMode("complete").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("qsketch_stream")
        .as[((String, Long), (Int, Seq[(Long, Long, Long)]))]
        .collect().toMap
      assert(streamed == ref)
    } finally q.stop()

    // Merged estimates off the sketches equal the batch SQL face.
    val est = ref.toSeq.groupBy(_._1._1).map { case (g, shards) =>
      val tStar = shards.map(_._2._1).max
      val retained = shards.flatMap(_._2._2)
        .filter(it => lvl(it._2) >= tStar).sorted
      val w = 1L << tStar; val nEst = retained.length * w
      g -> Seq(25L, 50L, 75L).map { qp =>
        val pos = ((qp * nEst + 99) / 100 + w - 1) / w
        (qp, tStar.toLong, retained.length.toLong, nEst,
          retained((pos - 1).toInt)._1)
      }
    }
    val batch = graft.operators.Profiling.quantileSketchOf(ev).collect()
      .groupBy(_.getAs[String]("grp")).view.mapValues(_.map(r =>
        (r.getAs[Long]("q_pct"), r.getAs[Long]("t_star"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_est"),
          r.getAs[Long]("est_cents"))).sortBy(_._1).toSeq).toMap
    assert(est == batch)
  }

  test("quantile sketch inside a watermarked windowed streaming agg " +
    "matches the batch windows") {
    // The production monitoring shape: per-(hour, group) value-quantile
    // sketches as ordinary mergeable agg state in an APPEND-mode
    // watermarked windowed aggregation — each window's sketch is final
    // when the watermark closes it, and equals the batch sketch of the
    // same window's rows (set-function property again).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    val qa = udaf(graft.functions.QuantileSketch.agg(k),
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    val base = 1700000000000L
    // (grp, eventMs, cents, h32, rowId): 3 hours × 2 groups × 400 rows.
    val rows = for (h <- 0 until 3; g <- Seq("a", "b"); i <- 0 until 400)
      yield (g, base + h * 3600000L + i * 1000L,
        (i * 37 % 1009).toLong,
        // independent deterministic hash per row
        java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"$g:$h:$i").substring(0, 8), 16),
        (h * 1000 + i).toLong)
    def windowed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("event_time", timestamp_millis(col("ms")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("grp"))
      .agg(qa(col("cents"), col("h32"), col("rid")).as("sketch"))
      .select(col("window.start").cast("long").as("w"), col("grp"),
        col("sketch"))
    val input = MemoryStream[(String, Long, Long, Long, Long)]
    val q = windowed(input.toDF()
        .toDF("grp", "ms", "cents", "h32", "rid"))
      .writeStream.format("memory").queryName("qsketch_windowed")
      .outputMode("append").start()
    try {
      // Two batches inside the window span, then a far-future batch to
      // advance the watermark past every window.
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(("a", base + 100L * 3600000L, 1L, 1L, 99999L))
      q.processAllAvailable()
      val got = spark.table("qsketch_windowed")
        .as[(Long, String, (Int, Seq[(Long, Long, Long)]))]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      val expect = windowed(rows.toDF("grp", "ms", "cents", "h32", "rid"))
        .as[(Long, String, (Int, Seq[(Long, Long, Long)]))]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      // All six in-span windows closed and match batch exactly.
      assert(expect.size == 6 && expect.forall { case (key, v) =>
        got.get(key).contains(v)
      })
      // The trims really fired inside streaming state (400 rows ≫ k).
      assert(expect.values.forall(v => v._1 > 0 && v._2.length <= 2 * k))
    } finally q.stop()
  }

  test("sketch roll-up merge ≡ the from-scratch sketch of the coarse grain") {
    // The identity the roll-up rests on: rows with ℓ ≥ t* all survive
    // every child filter, so merging children and re-trimming yields
    // EXACTLY the sketch a from-scratch build of the coarse grain
    // produces (when the merged threshold needs no extra floor — here
    // the children fit untrimmed, so the floor is 0).
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val k = 8L
    val docs = Tables.documents(spark, sf).select(
      concat(col("source"), lit(":"), col("lang")).as("grp"),
      col("doc_id").as("event_id"),
      size(split(lower(col("text")), "\\s+")).cast("long").as("cents"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "cents", "h32", "event_id", "t_star").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val fine = graft.operators.Profiling.sketchRetained(docs, k)
    assert(fine.agg(max("t_star")).collect()(0).getLong(0) == 0L,
      "precondition: children fit untrimmed at this SF")
    val merged = rows(graft.operators.Profiling
      .sketchRemerge(fine, lit("ALL"), k))
    val scratch = rows(graft.operators.Profiling
      .sketchRetained(docs.withColumn("grp", lit("ALL")), k))
    assert(merged == scratch && merged.nonEmpty)
    assert(merged.head._5 > 0, "the coarse grain really re-trimmed")
  }

  test("verified heavy hitters equal the exact groupBy answer") {
    val sf = "/root/testdata/sf0.01"
    val viaSketch = graft.operators.Profiling.heavyEventTypes(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val exact = ev.groupBy("event_type").count()
      .filter(col("count") > n / 8.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSketch == exact && viaSketch.nonEmpty)
  }
}
