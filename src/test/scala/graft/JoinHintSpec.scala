package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy HINTS — the escape hatch when statistics are wrong
  * (stale ANALYZE, opaque UDF selectivity, first run on fresh data):
  * every strategy the planner can pick is user-forcible from SQL or
  * the DataFrame API, which is what an operator reaches for at 3am
  * when one join in a 100 TB DAG picks the wrong side. Each hint is
  * pinned to the physical operator it must produce, plus the result
  * parity that proves a hint can change the PLAN but never the
  * ANSWER.
  */
class JoinHintSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("join-hint-spec", cores = "4")

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("each join-strategy hint forces its physical operator") {
    // Threshold off: nothing broadcasts on its own, so every strategy
    // below is the hint's doing.
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"))
      val dim = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))

      def planOf(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.sparkPlan.toString

      val expected = fact.join(dim.hint("merge"),
        col("o_custkey") === col("c_custkey")).count()

      val bc = fact.join(broadcast(dim),
        col("o_custkey") === col("c_custkey"))
      assert(planOf(bc).contains("BroadcastHashJoin"))
      assert(bc.count() == expected)

      val smj = fact.join(dim.hint("merge"),
        col("o_custkey") === col("c_custkey"))
      assert(planOf(smj).contains("SortMergeJoin"))

      val shj = fact.join(dim.hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      assert(planOf(shj).contains("ShuffledHashJoin"))
      assert(shj.count() == expected)

      // The SQL face: a /*+ SHUFFLE_MERGE */ comment-hint reaches the
      // same planner seam as the DataFrame .hint call.
      fact.createOrReplaceTempView("hint_fact")
      dim.createOrReplaceTempView("hint_dim")
      val sqlHinted = spark.sql(
        """SELECT /*+ SHUFFLE_MERGE(hint_dim) */ count(*)
          |FROM hint_fact JOIN hint_dim ON o_custkey = c_custkey""".stripMargin)
      assert(planOf(sqlHinted).contains("SortMergeJoin"))
      assert(sqlHinted.collect()(0).getLong(0) == expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
