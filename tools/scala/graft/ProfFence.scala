package graft

import org.apache.spark.sql.functions._

/** A/B: scoped (cache-only) vs fenced (cache + plan-fence) inputs for
  * the CC-heavy dataflows — quantifies how much of q117/q105/q64's
  * wall is repeated driver-side analysis of deep lineages. */
object ProfFence {
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
      println(f"PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // warm codegen/JIT once
    Registry.queriesMap("q117_cluster_remove")(spark, dir).collect(); Scratch.releaseAll()
    for (i <- 1 to 2) {
      t(s"q117 registered (scoped) #$i") {
        Registry.queriesMap("q117_cluster_remove")(spark, dir).collect() }
      Scratch.releaseAll()
      t(s"q117 fenced variant #$i") {
        val rem = queries.h60(concat(lit("remove:"), col("doc_id"))) % 10 === 0
        val pairs = Scratch.fenced(queries.DedupOps.minhashPairs(spark, dir)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
        val standing = Scratch.fenced(queries.DedupOps.componentsOf(pairs))
        val removed = queries.t(spark, dir, "documents").where(rem)
          .select(col("doc_id").as("id"))
        queries.DedupOps.removeFromComponents(standing, pairs, removed)
          .groupBy(col("comp"))
          .agg(min(col("id")).as("canonical_id"), count(lit(1)).as("n_docs"),
            concat_ws(",", transform(sort_array(collect_list(col("id"))),
              x => x.cast("string"))).as("members"))
          .select(col("canonical_id"), col("n_docs"), col("members"))
          .orderBy(col("canonical_id")).collect() }
      Scratch.releaseAll()
      t(s"q64 registered #$i") {
        Registry.queriesMap("q64_dedupe_components")(spark, dir).collect() }
      Scratch.releaseAll()
      t(s"q105 registered #$i") {
        Registry.queriesMap("q105_cluster_merge")(spark, dir).collect() }
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
