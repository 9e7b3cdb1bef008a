package graft

import org.apache.spark.sql.SparkSession

/** Volume run of the multimodal-column operators (q60–q63) at 2M
  * documents: binary payload manifest, mapPartitions typed decode,
  * frame-index fanout, fixed-size chunk manifest. The decode itself is
  * the documented deterministic stub — what this measures is the part
  * a codec swap would keep: binary columns through the scan, the
  * per-partition typed batch path, and the generator fanouts.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.MultimodalBench /tmp/curation2m"
  */
object MultimodalBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/curation2m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(q: Q, d: String): Long = q.run(spark, d).queryExecution.toRdd.count()
    for (q <- queries.MultimodalOps.all) {
      exec(q, "/root/testdata/sf0.001"); Scratch.releaseAll()
    }
    for (q <- queries.MultimodalOps.all) {
      val t0 = System.nanoTime()
      val n = exec(q, dir)
      val dt = (System.nanoTime() - t0) / 1e9
      Scratch.releaseAll()
      println(f"MMBENCH ${q.name}%-22s $dt%8.2f s  rows=$n%,d")
    }
    spark.stop()
  }
}
