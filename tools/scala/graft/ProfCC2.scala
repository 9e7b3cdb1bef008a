package graft

import graft.etl.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Chain-graph-only CC profile (CCBench case C) with per-round debug. */
object ProfCC2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val C3 = 64L; val V3 = args.headOption.map(_.toLong).getOrElse(1000000L)
    val v = spark.range(V3).as[java.lang.Long]
    val e = spark.range(V3 - C3).select((col("id") + C3).as("src"), col("id").as("dst")).as[Pipeline.Edge]
    v.count(); e.count()
    for (i <- 1 to args.lift(1).map(_.toInt).getOrElse(1)) {
      val t0 = System.nanoTime()
      val labels = Pipeline.distributedComponents(v, e)
      val bad = labels.where(col("comp") =!= col("id") % C3).count()
      println(f"PROFCC2 total ${(System.nanoTime() - t0) / 1e9}%6.2f s parity=${if (bad == 0) "OK" else "FAIL"}")
    }
    spark.stop()
  }
}
