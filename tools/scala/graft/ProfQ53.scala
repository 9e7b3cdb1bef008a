package graft
import org.apache.spark.sql.SparkSession
object ProfQ53 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobStart.get(je.jobId)).foreach { t0 =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 30) println(f"  job ${je.jobId}%4d ${ms}%9.1f ms")
        }
    })
    val fn = SparkEntry.queries("q53_ngram_jaccard")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      println(f"PROFQ53 rep $i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
