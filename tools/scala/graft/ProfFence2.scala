package graft

import org.apache.spark.sql.functions._

object ProfFence2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    Registry.queriesMap("q105_cluster_merge")(spark, dir).collect(); Scratch.releaseAll()
    for (i <- 1 to 2) {
      t(s"q105 registered #$i") {
        Registry.queriesMap("q105_cluster_merge")(spark, dir).collect() }
      Scratch.releaseAll()
      t(s"q105 fenced variant #$i") {
        val (standing0, matches) = queries.DedupOps.q105Relations(spark, dir)
        val standing = Scratch.fenced(standing0)
        val m = Scratch.fenced(matches)
        queries.DedupOps.mergeComponents(standing, m)
          .groupBy(col("comp"))
          .agg(min(col("id")).as("canonical_id"), count(lit(1)).as("n_docs"),
            concat_ws(",", transform(sort_array(collect_list(col("id"))),
              x => x.cast("string"))).as("members"))
          .select(col("canonical_id"), col("n_docs"), col("members"))
          .orderBy(col("canonical_id")).collect() }
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
