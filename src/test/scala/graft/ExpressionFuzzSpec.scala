package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PROPERTY-BASED DIFFERENTIAL FUZZING of the custom expression
  * families (r15 verdict №5) — widens the fixed-workload
  * `CodegenParitySpec` to ScalaCheck-generated inputs, ≥1000 seeds per
  * family, three ways: forced CODEGEN_ONLY, forced NO_CODEGEN, and an
  * independent plain-Scala reference. The generators are DETERMINISTIC
  * (`pureApply` with a fixed seed per case, the ScaleToolsSpec Avro
  * pattern), so a failure is a reproducible counterexample, never a
  * flake.
  *
  * Why three-way: codegen↔interpreted parity alone would pass if BOTH
  * paths shared a bug in the common kernel (they call the same instance
  * method); the driver-side reference re-derives the semantics
  * independently, so a kernel bug diverges from it even when the two
  * Spark paths agree.
  */
class ExpressionFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Cases = 1000

  @transient lazy val spark: SparkSession =
    GraftSession.create("expression-fuzz-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  /** Generate `Cases` deterministic samples of `gen`. */
  private def samples[A](gen: Gen[A]): Seq[A] =
    (1 to Cases).map(i => gen.pureApply(Gen.Parameters.default, Seed(i)))

  /** Collect `df` (id → value) under forced codegen and forced
    * interpretation; both must equal `expect`. */
  private def assertThreeWay[A](name: String, df: DataFrame,
      expect: Map[Long, A], read: org.apache.spark.sql.Row => A): Unit = {
    val modes = Seq(
      "codegen" -> Map(
        "spark.sql.codegen.wholeStage" -> "true",
        "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY"),
      "interpreted" -> Map(
        "spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN"))
    modes.foreach { case (mode, conf) =>
      val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val got =
        try df.collect().map(r => r.getLong(0) -> read(r)).toMap
        finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      assert(got.size == expect.size, s"$name/$mode: row count")
      expect.foreach { case (id, want) =>
        assert(got(id) == want,
          s"$name/$mode diverges from the Scala reference at case $id: " +
            s"got ${got(id)}, want $want")
      }
    }
  }

  test(s"Shingles / ShinglesAll: $Cases fuzzed texts ≡ reference n-grams") {
    import spark.implicits._
    // ASCII texts with mixed-case letters, digits, punctuation and
    // whitespace RUNS (space/tab/newline) — the split/lowercase edge
    // surface. Lowercasing is replicated with Java's ASCII-safe path;
    // exotic-locale case mapping is out of the fuzz domain on purpose.
    val token = Gen.stringOfN(3, Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('.', ',', '!', 'X', 'q')))
    val ws = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val text = for {
      k <- Gen.choose(0, 12)
      toks <- Gen.listOfN(k, token)
      seps <- Gen.listOfN(math.max(k - 1, 0), ws)
      lead <- Gen.oneOf("", " ")
      trail <- Gen.oneOf("", "\t")
      n <- Gen.oneOf(1, 2, 3, 5)
    } yield (lead + toks.zipAll(seps, "", "")
      .map { case (t, s) => t + s }.mkString + trail, n)

    def refTokens(s: String): Array[String] =
      s.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    def refAll(s: String, n: Int): Seq[String] = {
      val t = refTokens(s)
      if (t.length < n) Seq.empty
      else (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" "))
    }
    def refDistinct(s: String, n: Int): Seq[String] =
      refAll(s, n).distinct // first-occurrence order, like array_distinct

    val cases = samples(text).zipWithIndex
      .map { case ((s, n), i) => (i.toLong, s, n) }
    cases.groupBy(_._3).foreach { case (n, group) =>
      val df = group.toDF("id", "text", "n")
      val expectD = group.map(c => c._1 -> refDistinct(c._2, n)).toMap
      val expectA = group.map(c => c._1 -> refAll(c._2, n)).toMap
      def shim(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        org.apache.spark.sql.GraftSqlShim.column(e)
      def ex(c: org.apache.spark.sql.Column) =
        org.apache.spark.sql.GraftSqlShim.expression(c)
      assertThreeWay[Seq[String]](s"Shingles(n=$n)",
        df.select(col("id"),
          shim(graft.functions.Shingles(ex(col("text")), n)).as("s")),
        expectD, _.getSeq[String](1))
      assertThreeWay[Seq[String]](s"ShinglesAll(n=$n)",
        df.select(col("id"),
          shim(graft.functions.ShinglesAll(ex(col("text")), n)).as("s")),
        expectA, _.getSeq[String](1))
    }
  }

  test(s"HilbertIndex: $Cases fuzzed points round-trip through the " +
      "published inverse (bijectivity IS the reference)") {
    import spark.implicits._
    // Any Long input, including negatives and values past the 31-bit
    // domain — the expression masks to the curve's domain.
    val point = for {
      x <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      y <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (x, y)
    val cases = samples(point).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
    val df = cases.toDF("id", "x", "y")
      .select(col("id"),
        graft.functions.HilbertIndex(col("x"), col("y")).as("d"))
    val expect = cases.map { case (i, x, y) =>
      // reference = the d2xy inverse: d is correct iff it maps back to
      // the masked point (plus domain check), independent of xy2d.
      i -> (x & graft.functions.HilbertIndex.Mask,
        y & graft.functions.HilbertIndex.Mask)
    }.toMap
    Seq(
      ("codegen", "CODEGEN_ONLY", "true"),
      ("interpreted", "NO_CODEGEN", "false")).foreach {
      case (mode, factory, ws) =>
        spark.conf.set("spark.sql.codegen.factoryMode", factory)
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        val got =
          try df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          finally {
            spark.conf.unset("spark.sql.codegen.factoryMode")
            spark.conf.unset("spark.sql.codegen.wholeStage")
          }
        got.foreach { case (id, d) =>
          assert(d >= 0 &&
            d < graft.functions.HilbertIndex.N * graft.functions.HilbertIndex.N,
            s"HilbertIndex/$mode: d out of domain at case $id")
          assert(graft.functions.HilbertIndex.inverse(d) == expect(id),
            s"HilbertIndex/$mode: inverse(d) ≠ masked point at case $id")
        }
    }
  }

  test(s"SortedIntersectSize: $Cases fuzzed sorted sets ≡ set " +
      "intersection size") {
    import spark.implicits._
    // Small shared alphabet so intersections are dense; empty and
    // disjoint sets included. ASCII ⇒ String order = UTF8 binary order,
    // the expression's contract.
    val alphabet = (0 until 40).map(i => f"tok$i%02d")
    val sortedSet = Gen.someOf(alphabet).map(_.sorted.toArray)
    val pair = for { a <- sortedSet; b <- sortedSet } yield (a, b)
    val cases = samples(pair).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a.toSeq, b.toSeq) }
    val df = cases.toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.SortedIntersectSize(col("a"), col("b")).as("c"))
    val expect = cases.map { case (i, a, b) =>
      i -> a.toSet.intersect(b.toSet).size.toLong
    }.toMap
    assertThreeWay[Long]("SortedIntersectSize", df, expect, _.getLong(1))
  }

  test(s"LshBands: $Cases fuzzed float vectors ≡ reference banded " +
      "hyperplane signs") {
    import spark.implicits._
    val Bits = 4
    val Dims = 8
    val planes: Seq[Seq[Double]] = Seq.tabulate(16)(p =>
      Seq.tabulate(Dims)(k => ((p * Dims + k) % 11 - 5) / 4.0))
    val floatGen = Gen.oneOf(
      Gen.chooseNum(-1e6f, 1e6f),
      Gen.oneOf(0.0f, -0.0f, 1.5f, -2.25f, Float.MaxValue,
        Float.PositiveInfinity, Float.NegativeInfinity))
    // Vector lengths 0..12 straddle the plane dim (the kernel min()s).
    val vec = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, floatGen))
    val cases = samples(vec).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val df = cases.toDF("id", "v")
      .select(col("id"),
        graft.functions.LshBands(col("v"), planes, Bits).as("bands"))
    def refBands(a: Array[Float]): Seq[Long] =
      (0 until planes.length / Bits).map { b =>
        (0 until Bits).foldLeft(0L) { (acc, k) =>
          val w = planes(b * Bits + k)
          val n = math.min(a.length, w.length)
          var dot = 0.0
          var i = 0
          while (i < n) { dot += a(i).toDouble * w(i); i += 1 }
          if (dot > 0) acc | (1L << k) else acc
        }
      }
    val expect = cases.map { case (i, v) => i -> refBands(v) }.toMap
    assertThreeWay[Seq[Long]]("LshBands", df, expect, _.getSeq[Long](1))
  }

  test(s"CosineSim / DotConst: $Cases fuzzed float vectors ≡ the exact " +
      "sequential-fold reference, bit for bit") {
    import spark.implicits._
    val Dims = 8
    val weights = Seq.tabulate(Dims)(k => (k % 7 - 3) / 2.0)
    val floatGen = Gen.oneOf(
      Gen.chooseNum(-1e4f, 1e4f),
      Gen.oneOf(0.0f, -0.0f, 1.0f, -1.0f, Float.MinPositiveValue,
        Float.MaxValue))
    val pair = for {
      na <- Gen.choose(0, 10)
      nb <- Gen.choose(0, 10)
      a <- Gen.listOfN(na, floatGen)
      b <- Gen.listOfN(nb, floatGen)
    } yield (a.toArray, b.toArray)
    val cases = samples(pair).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val df = cases.toDF("id", "a", "b").select(col("id"),
      graft.functions.CosineSim(col("a"), col("b")).as("cos"),
      graft.functions.DotConst(col("a"), weights).as("dot"))
    // Exact replay of the kernels' fold order; NaN (zero-norm or empty
    // vectors) compares via canonical bits.
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / math.sqrt(na) / math.sqrt(nb)
    }
    def dotRef(a: Array[Float]): Double = {
      val n = math.min(a.length, weights.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += a(i).toDouble * weights(i); i += 1 }
      acc
    }
    val expect = cases.map { case (i, a, b) =>
      i -> (java.lang.Double.doubleToLongBits(cosRef(a, b)),
        java.lang.Double.doubleToLongBits(dotRef(a)))
    }.toMap
    assertThreeWay[(Long, Long)]("CosineSim/DotConst", df, expect,
      r => (java.lang.Double.doubleToLongBits(r.getDouble(1)),
        java.lang.Double.doubleToLongBits(r.getDouble(2))))
  }

  test(s"L2Sq: $Cases fuzzed long vectors ≡ exact integer distance") {
    import spark.implicits._
    // Quantized-code domain (|v| ≤ 2^20): n·d² stays far inside Long.
    val vGen = Gen.chooseNum(-(1L << 20), 1L << 20)
    val pair = for {
      n <- Gen.choose(0, 12)
      a <- Gen.listOfN(n, vGen)
      b <- Gen.listOfN(n, vGen)
    } yield (a, b)
    val cases = samples(pair).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val df = cases.toDF("id", "a", "b").select(col("id"),
      graft.functions.L2Sq(col("a"), col("b")).as("d2"))
    val expect = cases.map { case (i, a, b) =>
      i -> a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    }.toMap
    assertThreeWay[Long]("L2Sq", df, expect, _.getLong(1))
  }

  test(s"QSketchLevel: $Cases fuzzed longs ≡ the relational " +
      "Σ-of-divisibility AND QuantileSketch.level") {
    import spark.implicits._
    // Full Long domain on purpose: the r15 advice fix masks to the low
    // 32 bits, which is exactly what makes the expression equal the
    // batch Σ_{j=1..32}[h ≡ 0 mod 2ʲ] replay for EVERY input.
    val h = Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(0L, (1L << 32) - 1),
      Gen.oneOf(0L, 1L, 1L << 31, 1L << 32, (1L << 32) + 4L, 1L << 33,
        3L * (1L << 33), Long.MinValue, Long.MaxValue))
    val cases = samples(h).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = cases.toDF("id", "h")
      .select(col("id"), org.apache.spark.sql.GraftSqlShim.column(
        graft.functions.QSketchLevel(
          org.apache.spark.sql.GraftSqlShim.expression(col("h")))).as("l"))
    val expect = cases.map { case (i, v) =>
      val sigma = (1 to 32).count(j => v % (1L << j) == 0)
      assert(sigma == graft.functions.QuantileSketch.level(v),
        s"level() itself diverges from Σ at h=$v")
      i -> sigma
    }.toMap
    assertThreeWay[Int]("QSketchLevel", df, expect, _.getInt(1))
  }
}
