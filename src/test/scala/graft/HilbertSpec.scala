package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HilbertIndex

/** The Hilbert kernel: bijectivity (index ∘ inverse = id), the
  * unit-step adjacency property that makes the curve a strictly better
  * clustering key than the Morton interleave, and parity of the
  * codegen'd expression against the reference implementation.
  */
class HilbertSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("hilbert-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  /** Deterministic sample positions along the curve (LCG — no RNG). */
  private def samples(n: Int, mod: Long): Seq[Long] = {
    var s = 88172645463325252L
    (1 to n).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      java.lang.Math.floorMod(s, mod)
    }
  }

  private val expr = HilbertIndex( // eval host for the reference index()
    org.apache.spark.sql.catalyst.expressions.Literal(0L),
    org.apache.spark.sql.catalyst.expressions.Literal(0L))

  test("index(inverse(d)) round-trips: the mapping is a bijection") {
    for (d <- samples(500, (1L << 62) - 1)) {
      val (x, y) = HilbertIndex.inverse(d)
      assert(expr.index(x, y) == d, s"d=$d -> ($x, $y)")
    }
  }

  test("consecutive curve positions are UNIT grid steps (no Z-order teleports)") {
    for (d <- samples(500, (1L << 62) - 2)) {
      val (x0, y0) = HilbertIndex.inverse(d)
      val (x1, y1) = HilbertIndex.inverse(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"teleport between d=$d ($x0,$y0) and d+1 ($x1,$y1)")
    }
  }

  test("codegen'd expression matches the reference on corner and sampled keys") {
    import spark.implicits._
    val keys = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (HilbertIndex.Mask, HilbertIndex.Mask), (HilbertIndex.Mask, 0L)) ++
      samples(200, HilbertIndex.N).zip(samples(200, HilbertIndex.N).reverse)
    val got = keys.toDF("x", "y")
      .select(col("x"), col("y"), HilbertIndex(col("x"), col("y")).as("d"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((x, y) <- keys)
      assert(got((x, y)) == expr.index(x, y), s"($x, $y)")
  }

  test("keys above the 31-bit domain mask instead of aliasing silently") {
    // index() masks to the low 31 bits on BOTH coordinates — a key at
    // 2^31 + k lands exactly where k does, by construction, and the
    // spec pins that this is the masked semantics, not an overflow.
    assert(expr.index(HilbertIndex.N + 17L, 5L) == expr.index(17L, 5L))
  }
}
