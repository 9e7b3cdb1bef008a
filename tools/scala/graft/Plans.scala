package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: plan audit over the declared queries. For each query,
  * prints scan columns (pruning), pushed filters, exchange count
  * (shuffles), and whole-stage-codegen coverage from the formatted
  * physical plan. Usage: runMain graft.Plans [sfDir] [query...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val qs = Registry.all.filter(q => names.isEmpty || names.contains(q.name))
    for (q <- qs) {
      try {
        val df = q.run(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val scans = plan.linesIterator.filter(_.contains("Scan parquet")).size
        val readSchemas = plan.linesIterator.filter(_.trim.startsWith("ReadSchema:"))
          .map(_.trim.stripPrefix("ReadSchema: ")).toSeq
        val pushed = plan.linesIterator.filter(_.trim.startsWith("PushedFilters:"))
          .map(_.trim.stripPrefix("PushedFilters: ")).toSeq
        val exchanges = plan.linesIterator.count(l =>
          l.contains("Exchange") && !l.contains("Reused"))
        val wscg = plan.linesIterator.count(_.contains("codegen id"))
        val widths = readSchemas.map(s => s.count(_ == ',') + (if (s.contains("struct<>")) -1 else 1))
        println(f"PLAN ${q.name}%-30s scans=$scans%2d cols=${widths.mkString("/")}%-10s " +
          f"exchanges=$exchanges%2d wscg=$wscg%2d pushed=${pushed.count(_ != "[]")}")
      } catch {
        case e: Throwable => println(s"PLAN ${q.name} ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
