package graft

import org.apache.spark.sql.SparkSession

/** Volume run of the corpus-curation operators (q80–q84) against a
  * `tools/curation_gen.py` documents corpus — the scale evidence that
  * the df-aggregate, salted sampler, budget windows, gate scan and
  * shard manifest hold when the documents table is millions of rows,
  * not thousands. Usage:
  *   sbt "Test/runMain graft.CurationBench /tmp/curation2m"
  */
object CurationBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/curation2m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Force FULL materialization of every output row: a plain count()
    // lets Catalyst prune unreferenced columns, so a narrow map-only
    // query (q83) would be timed as a row-count over the scan with the
    // whole gate computation optimized away. toRdd evaluates the final
    // codegen projection without the driver collecting anything.
    def exec(q: Q, d: String): Long = q.run(spark, d).queryExecution.toRdd.count()
    // Plan/codegen warmup at the test scale so the timed numbers
    // measure data work, not one-time JVM compilation.
    for (q <- queries.CurationOps.all) {
      exec(q, "/root/testdata/sf0.001"); Scratch.releaseAll()
    }
    for (q <- queries.CurationOps.all) {
      val t0 = System.nanoTime()
      val n = exec(q, dir)
      val dt = (System.nanoTime() - t0) / 1e9
      Scratch.releaseAll()
      println(f"CURBENCH ${q.name}%-24s $dt%7.2f s  rows=$n")
    }
    spark.stop()
  }
}
