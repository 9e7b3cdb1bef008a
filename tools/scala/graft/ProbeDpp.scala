package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Empirical probe: does dynamic partition pruning fire on a
  * broadcast LEFT SEMI join against a pid-partitioned parquet store,
  * under the session confs the registered queries run with? Decides
  * the q124 store-pruning mechanism (DPP join vs explicit pid filter). */
object ProbeDpp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scratch = java.nio.file.Files.createTempDirectory("dpp").toString
    spark.range(100000).toDF("doc_id")
      .withColumn("pid", floor(col("doc_id") / 1000))
      .withColumn("payload", md5(col("doc_id").cast("string")))
      .write.partitionBy("pid").mode("overwrite").parquet(s"$scratch/store")
    val store = spark.read.parquet(s"$scratch/store")
    val probe = spark.range(500).toDF("doc_id")
      .withColumn("pid", floor(col("doc_id") / 1000))
    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        recordsRead.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
    })
    val joined = store.join(broadcast(probe), Seq("pid", "doc_id"), "left_semi")
    joined.explain("formatted")
    recordsRead.set(0)
    val n = joined.count()
    Thread.sleep(500)
    println(s"PROBEDPP rows=$n recordsRead=${recordsRead.get} " +
      s"(full store = 100000; pruned would read ~1000)")
    spark.stop()
  }
}
