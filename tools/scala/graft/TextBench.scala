package graft

import org.apache.spark.sql.SparkSession

/** Volume run of the text-analysis family (q30–q38 stats/fingerprints,
  * q74–q78 scrubbing/packing/decontamination) against a 2M-document
  * corpus — hunting for operators whose cost at volume is dominated by
  * something the sf bench can't see (the round-8 regex wall was found
  * exactly this way in q50/q83). Full output materialization per query.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.TextBench /tmp/curation2m"
  */
object TextBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/curation2m")
    // Optional: comma-separated query names to run (default all).
    val only = args.lift(1).map(_.split(",").toSet).getOrElse(Set.empty[String])
    def sel(q: Q): Boolean = only.isEmpty || only(q.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(q: Q, d: String): Long = q.run(spark, d).queryExecution.toRdd.count()
    // q89/q95 register at the Registry tail, not in TextOps.all.
    val qs = queries.TextOps.all :+ queries.TextOps.q89 :+ queries.TextOps.q95 :+ queries.TextOps.q99
    for (q <- qs if sel(q)) {
      exec(q, "/root/testdata/sf0.001"); Scratch.releaseAll()
    }
    for (q <- qs if sel(q)) {
      val t0 = System.nanoTime()
      val n = exec(q, dir)
      val dt = (System.nanoTime() - t0) / 1e9
      Scratch.releaseAll()
      println(f"TEXTBENCH ${q.name}%-26s $dt%8.2f s  rows=$n%,d")
    }
    spark.stop()
  }
}
