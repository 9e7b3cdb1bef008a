package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}

/** Per-Spark-job/stage timing of one named query: run it `reps` times
  * and print every job's wall plus the top stages by task time with
  * their callsites, so fixed overhead (job count) separates from
  * compute. Usage:
  *   sbt "Test/runMain graft.ProfJobs <sfDir> <query> [reps]"
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val q = Registry.all.find(_.name == name).getOrElse(sys.error(s"no query $name"))

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        jobStart.put(js.jobId, System.nanoTime())
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.add((sc.stageInfo.name.takeWhile(_ != '+').trim,
          sc.stageInfo.taskMetrics.executorRunTime, sc.stageInfo.numTasks))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(je.jobId)).foreach { t0 =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 20) jobLines.add(f"  job ${je.jobId}%4d ${ms}%9.1f ms")
        }
      }
    })
    for (i <- 1 to reps) {
      jobLines.clear(); stages.clear(); jobCount.set(0)
      val t0 = System.nanoTime()
      val n = q.run(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Scratch.releaseAll()
      val byName = new scala.collection.mutable.LinkedHashMap[String, (Long, Int, Int)]()
      stages.forEach { case (nm, t, nt) =>
        val (pt, pn, pc) = byName.getOrElse(nm, (0L, 0, 0))
        byName(nm) = (pt + t, pn + nt, pc + 1)
      }
      val taskSum = byName.valuesIterator.map(_._1).sum / 1000.0
      println(f"== $name run$i ${dt}%7.2f s  rows=$n  jobs=${jobCount.get}  taskTimeSum=$taskSum%.1f s")
      jobLines.forEach(println(_))
      byName.toSeq.sortBy(-_._2._1).take(14).foreach { case (nm, (t, nt, c)) =>
        println(f"  stage ${t / 1000.0}%8.2f s  tasks=$nt%4d  stages=$c%2d  $nm")
      }
    }
    spark.stop()
  }
}
