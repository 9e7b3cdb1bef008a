package graft

/** One-off plan audit for q107–q109 at sf0.1: prints the formatted
  * physical plans so the shuffle/broadcast structure can be read off
  * (histogram exchange for q107; broadcast count/weight tables and a
  * single per-doc exchange for q108; broadcast anchors + rank-1
  * windows for q109). */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q107_exact_quantiles", "q108_dsir_weights", "q109_pair_mining")) {
      println(s"\n========== $q ==========")
      println(Registry.queriesMap(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
