package graft

import org.apache.spark.sql.functions._

/** Throwaway instrumentation for the PPJoin stages — not registered. */
object DebugPP {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-debugpp")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debugpp] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val ex = t("index+localCheckpoint") {
      graft.operators.Dedup.shingleIndex(spark, sfDir).localCheckpoint()
    }
    println(s"[debugpp] index rows: ${ex.count()}")
    val cand = graft.operators.Dedup.ppjoinCandidates(ex)
    t("candidates count") { println(s"[debugpp] candidates: ${cand.count()}") }
    val full = ex.as("a").join(ex.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
    t("full shared-shingle pairs count") {
      println(s"[debugpp] full pairs: ${full.count()}")
    }
    t("ppjoin end-to-end noop") {
      graft.operators.Dedup.ppjoinPairs(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
