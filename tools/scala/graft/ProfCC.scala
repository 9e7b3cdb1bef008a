package graft

import graft.etl.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-stage timing of the distributed CC round loop on the CCBench
  * B graph (10M-edge star) — instruments a copy of the loop so the
  * production code stays clean. */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.enabled", sys.env.getOrElse("PROFCC_COALESCE", "true"))
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val C2 = 1000000L; val E2 = 10000000L
    val vertexIds = spark.range(C2 + E2).as[java.lang.Long]
    val edges = spark.range(E2)
      .select((col("id") % C2).as("src"), (col("id") + C2).as("dst"))
      .as[Pipeline.Edge]
    vertexIds.count(); edges.count()

    def releaseCp(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFCC $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val total0 = System.nanoTime()
    val symmetric = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("materialize symmetric")(symmetric.count())
    var labels = vertexIds.toDF("id").withColumn("comp", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("comp").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = t("initial labelSum")(labelSum(labels))
    var converged = false
    var iterations = 0
    while (!converged && iterations < 50) {
      val neighborMin = symmetric.join(labels, symmetric("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      val hooked0 = labels.select(col("id"), col("comp"))
        .union(neighborMin)
        .groupBy("id").agg(min("comp").as("comp"))
      val hooked = t(s"round $iterations hook")(hooked0.localCheckpoint(true))
      val parents = hooked.select(col("id").as("pid"), col("comp").as("pcomp"))
      val next0 = hooked.join(parents, hooked("comp") === parents("pid"), "left")
        .select(hooked("id"), coalesce(col("pcomp"), hooked("comp")).as("comp"))
      val next = t(s"round $iterations jump")(next0.localCheckpoint(true))
      releaseCp(hooked)
      val newSum = t(s"round $iterations labelSum")(labelSum(next))
      labels.unpersist()
      labels = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iterations += 1
    }
    println(f"PROFCC TOTAL ${(System.nanoTime() - total0) / 1e9}%8.2f s  rounds=$iterations")
    spark.stop()
  }
}
