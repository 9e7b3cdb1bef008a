package graft

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-20 optimization profiler: per query (prepared, min-of-2 like
  * Bench) report wall seconds AND where they go — job count, stage
  * count, task count, summed executor task time, shuffle read/write
  * bytes — so the optimization targets the actual cost class
  * (sequential actions / driver planning vs executor compute vs
  * shuffle volume). Guide §1: measure first.
  *
  * Usage: sbt "Test/runMain graft.ProfR20 [sfDir] [qname...]"
  */
object ProfR20 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val spillB = new AtomicLong
    val jobSites = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    val jobNanos = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val siteNanos = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = String.valueOf(e.properties.getProperty("callSite.short"))
        jobSites.computeIfAbsent(site, _ => new AtomicInteger).incrementAndGet()
        jobNanos.put(e.jobId, (site, System.nanoTime()))
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val v = jobNanos.remove(e.jobId)
        if (v != null) siteNanos.computeIfAbsent(v._1, _ => new AtomicLong)
          .addAndGet(System.nanoTime() - v._2)
        ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillB.addAndGet(m.diskBytesSpilled)
        }
        ()
      }
    })
    def snap(): (Int, Int, Int, Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskTimeMs.get, shufR.get, shufW.get, spillB.get)

    val qs = Registry.all.filter(q => names.isEmpty || names.exists(q.name.startsWith))
    // Warm pass (bench methodology): plans + codegen warm at sf0.001.
    val warm = "/root/testdata/sf0.001"
    qs.foreach { q =>
      try q.run(spark, warm).count() catch { case _: Throwable => () }
      Scratch.releaseAll()
    }
    println("PROFR20 query                             pass  wall_s   jobs stages  tasks  taskt_s shufR_MB shufW_MB spill_MB")
    qs.foreach { q =>
      val walls = (1 to 2).map { pass =>
        Registry.preparesMap.get(q.name).foreach(p =>
          try p(spark, dir) catch { case e: Throwable =>
            println(s"PREPFAIL ${q.name}: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(200)}") })
        val b = snap()
        val t0 = System.nanoTime()
        try q.run(spark, dir).count() catch { case e: Throwable =>
          println(s"ERR ${q.name}: ${e.getMessage.take(120)}") }
        val wall = (System.nanoTime() - t0) / 1e9
        val a = snap()
        Scratch.releaseAll()
        println(f"PROFR20 ${q.name}%-38s $pass%4d ${wall}%7.2f ${a._1 - b._1}%6d ${a._2 - b._2}%6d ${a._3 - b._3}%6d ${(a._4 - b._4) / 1e3}%8.2f ${(a._5 - b._5) / 1048576.0}%8.1f ${(a._6 - b._6) / 1048576.0}%8.1f ${(a._7 - b._7) / 1048576.0}%8.1f")
        wall
      }
      println(f"PROFR20 ${q.name}%-38s  min ${walls.min}%7.2f")
      if (sys.env.contains("PROF_SITES")) {
        import scala.jdk.CollectionConverters._
        jobSites.asScala.toSeq.sortBy(-_._2.get).take(25).foreach { case (s, n) =>
          val ns = Option(siteNanos.get(s)).map(_.get).getOrElse(0L)
          println(f"  SITE ${n.get}%4d jobs ${ns / 1e9}%7.2f s  $s")
        }
        jobSites.clear(); siteNanos.clear()
      }
    }
    spark.stop()
  }
}
