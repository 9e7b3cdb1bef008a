package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.Registry

/** Job-level profile of a single query (default q45): registers a
  * SparkListener, runs the query warm (sf0.001) then timed (target SF),
  * and prints every Spark job of the timed run with its wall time and
  * the call site that scheduled it — the direct measurement of "how
  * many job barriers does this query pay and which are the fixed
  * overhead". */
object Prof9 {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q45_dedupe_merge")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warmDir = new java.io.File(new java.io.File(dir).getParentFile, "sf0.001").getPath

    val q = Registry.all.find(_.name == qname).getOrElse(sys.error(s"no query $qname"))

    case class J(id: Int, start: Long, var end: Long = -1L, site: String = "")
    val jobs = new scala.collection.mutable.ArrayBuffer[J]
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        if (record) jobs += J(e.jobId, System.nanoTime(),
          site = Option(e.properties.getProperty("callSite.short")).getOrElse(""))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobs.find(_.id == e.jobId).foreach(_.end = System.nanoTime())
      }
    })

    def run(d: String): Double = {
      val t0 = System.nanoTime()
      q.run(spark, d).collect()
      Scratch.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"WARM   ${run(warmDir)}%8.2f s")
    record = true
    val wall = run(dir)
    record = false
    Thread.sleep(300)
    synchronized {
      var prevEnd = 0L
      val t0 = jobs.headOption.map(_.start).getOrElse(0L)
      for (j <- jobs.sortBy(_.start)) {
        val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1e9
        val dur = if (j.end < 0) Double.NaN else (j.end - j.start) / 1e9
        println(f"JOB ${j.id}%3d  +${(j.start - t0) / 1e9}%6.2f  gap=$gap%5.2f  dur=$dur%6.2f  ${j.site}")
        prevEnd = math.max(prevEnd, if (j.end < 0) j.start else j.end)
      }
      println(f"TIMED  $wall%8.2f s  jobs=${jobs.size}")
    }
    spark.stop()
  }
}
