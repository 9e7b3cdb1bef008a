package graft

import org.apache.spark.sql.SparkSession

/** Dump q87's formatted physical plan (plan-audit aid). */
object ExplainQ87 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Registry.queriesMap("q87_pipeline_composed")(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
