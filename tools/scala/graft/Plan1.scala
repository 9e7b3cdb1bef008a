package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the full formatted physical plan of one registered
  * query. Usage: runMain graft.Plan1 <queryName> [sfDir] */
object Plan1 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("query name required"))
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = Registry.all.find(_.name == name).getOrElse(sys.error(s"no query $name"))
    val df = q.run(spark, dir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    Scratch.releaseAll()
    spark.stop()
  }
}
