package graft

import org.apache.spark.sql.functions._

/** Decomposes q146's cost against its parts: q140, q144, q151 (the
  * sketch side's standalone cousin — same fold, dense roll-up added),
  * and q146, each run PREPARED, min-of-2, in one session (bench
  * conditions) — is the composition ≈ the sum of its sides, and if
  * not, where does the difference live?
  *
  * Usage: sbt "Test/runMain graft.ProfQ146 [sfDir]"
  */
object ProfQ146 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timedMin2(name: String): Double = {
      val times = (1 to 2).map { _ =>
        Registry.preparesMap.get(name).foreach(p => p(spark, dir))
        val t0 = System.nanoTime()
        Registry.queriesMap(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Scratch.releaseAll()
        dt
      }
      times.min
    }
    // Warm pass at the smallest sf (bench methodology).
    for (n <- Seq("q140_maintenance_epoch", "q144_ingest_epoch",
        "q151_hll_add_fold", "q146_nightly_job"))
      { try Registry.queriesMap(n)(spark, "/root/testdata/sf0.001").count()
        catch { case _: Throwable => () }; Scratch.releaseAll() }
    val t140 = timedMin2("q140_maintenance_epoch")
    val t144 = timedMin2("q144_ingest_epoch")
    val t151 = timedMin2("q151_hll_add_fold")
    val t146 = timedMin2("q146_nightly_job")
    println(f"PROFQ146  q140=$t140%5.2f s  q144=$t144%5.2f s  q151=$t151%5.2f s  " +
      f"sum=${t140 + t144 + t151}%5.2f s  q146=$t146%5.2f s  " +
      f"composition overhead=${t146 - t140 - t144 - t151}%+5.2f s")
    spark.stop()
  }
}
