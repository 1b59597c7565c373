package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEMPORARY r18 probe — decompose hot-query cost. Not committed. */
object Scratch {
  def time(label: String, reps: Int = 3)(f: => DataFrame): Unit = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scratch] $label: ${times.map(t => f"$t%.3f").mkString(" ")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-scratch")
    spark.range(1L << 20).selectExpr("sum(id)").collect()

    import org.apache.spark.sql.expressions.Window
    val k = 20
    val w = Window.orderBy(col("n_orders").desc, col("part_i"), col("part_j"))

    // Variant A: current itemPairs (double distinct, auto-broadcast join)
    def variantA(): DataFrame = {
      val items = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      items.as("a").join(items.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_i"), col("b.l_partkey").as("part_j"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_i"), col("part_j")).limit(k)
        .withColumn("rk", row_number().over(w))
    }

    // Variant B: distinct once + checkpoint + pinned broadcast
    def variantB(): DataFrame = {
      val items = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .localCheckpoint()
      items.as("a").join(broadcast(items.as("b")),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_i"), col("b.l_partkey").as("part_j"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_i"), col("part_j")).limit(k)
        .withColumn("rk", row_number().over(w))
    }

    // Variant C: array baskets, no join at all
    def variantC(): DataFrame = {
      Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey").as("o"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(flatten(
          expr("transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS pa, y AS pb)))")
        )).as("pr"))
        .groupBy(col("pr.pa").as("part_i"), col("pr.pb").as("part_j"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_i"), col("part_j")).limit(k)
        .withColumn("rk", row_number().over(w))
    }

    def withConf(kv: (String, String)*)(body: => Unit): Unit = {
      val olds = kv.map { case (key, _) => key -> spark.conf.getOption(key) }
      kv.foreach { case (key, v) => spark.conf.set(key, v) }
      try body finally olds.foreach {
        case (key, Some(v)) => spark.conf.set(key, v)
        case (key, None) => spark.conf.unset(key)
      }
    }

    val probeQs = Seq("q_link_prediction", "q_mad_prices", "q_item_pairs",
      "q_pagerank_trade", "q_kruskal_wallis", "q_fd_report",
      "q_containment_pairs", "q_ann_lsh")
    def runQ(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

    withConf(
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "67108864") {
      probeQs.foreach(q => time(s"shj:$q", 5)(runQ(q)))
    }
    probeQs.foreach(q => time(s"default:$q", 5)(runQ(q)))

    spark.stop()
  }
}
