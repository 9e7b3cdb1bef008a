package graft

import org.apache.spark.sql.functions._

/** Plan audit for the round-14 operators: prints exchange/broadcast
  * node counts for q116-q120/q123's registered plans at sf0.01, so
  * the scaladoc scale claims (broadcast semi/anti joins, no standing
  * shuffle) can be checked against the executed shapes. */
object ExplainR14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q116_index_remove", "q117_cluster_remove",
        "q118_quantile_remove", "q119_funnel_merge", "q120_retention_merge",
        "q123_embedding_index_remove")) {
      val df = Registry.queriesMap(q)(spark, dir)
      df.collect() // materialize so AQE resolves the final plan
      val plan = df.queryExecution.executedPlan.toString
      def n(s: String) = s.r.findAllIn(plan).size
      println(f"EXPLAIN $q%-28s shuffleEx=${n("Exchange hashpartitioning|Exchange rangepartitioning")}%2d  " +
        f"broadcastEx=${n("BroadcastExchange")}%2d  bhj=${n("BroadcastHashJoin")}%2d  smj=${n("SortMergeJoin")}%2d")
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
