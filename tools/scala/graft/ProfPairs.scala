package graft

import graft.etl.{ContactLogic, Pipeline, Synth}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level walls INSIDE one warm q45-shaped run: normalize memo,
  * then acceptedPairs' internal jobs (checkpoint barriers + edge count)
  * labeled by sequence, so the pair stage's cost splits into its
  * materializations instead of one lump. */
object ProfPairs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(starts.get(je.jobId)).foreach { t0 =>
          println(f"  job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
        }
    })

    for (rep <- 1 to 2) {
      println(s"---- rep $rep")
      val t0 = System.nanoTime()
      val norm = Pipeline.normalize(Synth.contacts(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)).localCheckpoint(true)
      println(f"normalize done at ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      val edges = Pipeline.acceptedPairs(norm, ContactLogic.DedupeConfig())
      println(f"acceptedPairs plan built at ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      val n = edges.count()
      println(f"edges=$n counted at ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
