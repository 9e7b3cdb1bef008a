package graft

/** Measurement-methodology probe (guide §1.4): times each named query
  * under BOTH terminal actions — the bench's historical `.count()` and
  * the noop sink (`format("noop")`), which computes every column of
  * every row — so the round's report can state exactly what the
  * count-based timing under-measures (column pruning above the final
  * projection, top-sort elision). Does NOT change the bench contract:
  * BENCH_r* numbers stay count-based for round-over-round
  * comparability.
  *
  * Usage: sbt "Test/runMain graft.NoopProbe [sfDir] [qname...]"
  */
object NoopProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Registry.all.filter(q => names.isEmpty || names.exists(q.name.startsWith))
    qs.foreach { q =>
      try { q.run(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
      Scratch.releaseAll()
    }
    qs.foreach { q =>
      def timed(act: org.apache.spark.sql.DataFrame => Unit): Double = {
        val ts = (1 to 2).map { _ =>
          Registry.preparesMap.get(q.name).foreach(p =>
            try p(spark, dir) catch { case _: Throwable => () })
          val t0 = System.nanoTime()
          try act(q.run(spark, dir)) catch { case e: Throwable =>
            println(s"ERR ${q.name}: ${e.getMessage.take(100)}") }
          val dt = (System.nanoTime() - t0) / 1e9
          Scratch.releaseAll()
          dt
        }
        ts.min
      }
      val c = timed(df => { df.count(); () })
      val n = timed(df => df.write.format("noop").mode("overwrite").save())
      println(f"NOOPPROBE ${q.name}%-38s count=$c%6.2f s  noop=$n%6.2f s  ratio=${n / c}%4.2f")
    }
    spark.stop()
  }
}
