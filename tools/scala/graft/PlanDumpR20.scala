package graft

import org.apache.spark.sql.SparkSession

/** Round-20 plan capture: writes each named query's
  * `.explain("formatted")` output to plans/r20/<qNN>_<suffix>.txt —
  * the before/after evidence the optimization round commits alongside
  * the code. Runs at bench conditions (local[$SPARK_GRAFT_CPUS],
  * shuffle partitions = cpus) so Exchange counts match the bench.
  *
  * Usage: sbt "Test/runMain graft.PlanDumpR20 <suffix> [sfDir] [qname...]"
  */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get("plans/r20")
    java.nio.file.Files.createDirectories(out)
    val qs = Registry.all.filter(q => names.isEmpty || names.exists(q.name.startsWith))
    for (q <- qs) {
      try {
        // Prepared artifacts (stores) in place, like the bench body.
        Registry.preparesMap.get(q.name).foreach(p =>
          try p(spark, dir) catch { case _: Throwable => () })
        val df = q.run(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val id = q.name.takeWhile(_ != '_')
        java.nio.file.Files.writeString(out.resolve(s"${id}_$suffix.txt"),
          s"== ${q.name} @ $dir (local[$cpus]) ==\n" + plan)
        println(s"PLANDUMP wrote ${id}_$suffix.txt (${plan.length} chars)")
      } catch {
        case e: Throwable => println(s"PLANDUMP ${q.name} ERROR ${e.getMessage.take(120)}")
      }
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
