package graft

import org.apache.spark.sql.functions._

object ProfFence3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    Registry.queriesMap("q73_neardup_clusters")(spark, dir).collect(); Scratch.releaseAll()
    for (i <- 1 to 2) {
      t(s"q73 registered #$i") {
        Registry.queriesMap("q73_neardup_clusters")(spark, dir).collect() }
      Scratch.releaseAll()
      t(s"q73 fenced variant #$i") {
        val pairs = Scratch.fenced(queries.DedupOps.minhashPairs(spark, dir)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
        val verts = pairs.select(col("src")).union(pairs.select(col("dst")))
          .distinct().as[java.lang.Long]
        val comps = graft.etl.Pipeline.connectedComponents(
          verts, pairs.as[graft.etl.Pipeline.Edge])
        comps.groupBy(col("comp"))
          .agg(min(col("id")).as("canonical_id"), count(lit(1)).as("n_docs"),
            concat_ws(",", transform(sort_array(collect_list(col("id"))),
              x => x.cast("string"))).as("members"))
          .select(col("canonical_id"), col("n_docs"), col("members"))
          .orderBy(col("canonical_id")).collect() }
      Scratch.releaseAll()
      t(s"q100 registered #$i") {
        Registry.queriesMap("q100_quality_canonical")(spark, dir).collect() }
      Scratch.releaseAll()
      t(s"q93 registered #$i") {
        Registry.queriesMap("q93_embedding_scaled_clusters")(spark, dir).collect() }
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
