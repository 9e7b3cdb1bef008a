package graft

import org.apache.spark.sql.SparkSession

/** Phase-level timing of the q64 dataflow, plus the end-to-end query
  * wall: shows whether the remaining cost is the normalize checkpoint,
  * candidate generation, pair scoring, the CC closure, or the final
  * per-cluster countDistinct aggregation. Reps > 1 show warm cost. */
object ProfQ64 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFQ64 $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobStart.get(je.jobId)).foreach { case (t0, cs) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 30) println(f"  job ${je.jobId}%4d ${ms}%9.1f ms  $cs")
        }
    })
    val fn = SparkEntry.queries("q64_dedupe_components")
    for (i <- 1 to reps) {
      println(s"---- rep $i")
      t("q64 end-to-end") { fn(spark, dir).count() }
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
