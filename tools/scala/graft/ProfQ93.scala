package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profile of the q93 cluster-rollup phases (see round-9
  * EmbedDedupBench timing investigation). */
object ProfQ93 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/embed100k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (ms > 300) println(f"PROFQ93STAGE ${si.stageId}%4d ${ms / 1000.0}%7.2f s tasks=${si.numTasks} rdds=${si.rddInfos.map(r => r.name + "@" + r.scope.map(_.name).getOrElse("?")).mkString("|").take(160)}")
      }
    })

    def tick[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFQ93 $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val pairs = queries.DedupOps.embeddingPairsScaled(spark, dir, 6, 20, 64, 0.8)
      .select(col("vec_a"), col("vec_b")).cache()
    tick("pairs.count (build cache)")(pairs.count())
    tick("pairs.count (cached)")(pairs.count())
    val edges = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .as[graft.etl.Pipeline.Edge]
    val verts = edges.select(col("src")).union(edges.select(col("dst")))
      .distinct().as[java.lang.Long]
    tick("verts.count")(verts.count())
    tick("verts.count again")(verts.count())
    tick("wrapped verts count PRE-cc")(
      verts.toDF("id").select((col("id") + 1).as("x")).count())
    val ccDf = tick("cc plan (driver UF inside)")(
      graft.etl.Pipeline.connectedComponents(verts, edges))
    tick("pairs.count POST-cc")(pairs.count())
    tick("wrapped verts count POST-cc")(
      verts.toDF("id").select((col("id") + 1).as("x")).count())
    def scanSummary(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val p = df.queryExecution.executedPlan.toString
      println(s"PROFQ93PLAN $label inMemScans=${"InMemoryTableScan".r.findAllIn(p).size} parquetScans=${"Scan parquet".r.findAllIn(p).size} udfs=${"BatchEvalPython|ScalaUDF".r.findAllIn(p).size}")
    }
    scanSummary(verts.toDF("id"), "verts")
    scanSummary(ccDf, "ccDf")
    println("PROFQ93FULLPLAN-VERTS\n" + verts.toDF("id").queryExecution.executedPlan.toString.take(2500))
    println("PROFQ93FULLPLAN-CCDF\n" + ccDf.queryExecution.executedPlan.toString.take(4000))
    tick("ccDf.count")(ccDf.count())
    tick("ccDf.count again")(ccDf.count())
    val comps = ccDf.groupBy(col("comp"))
      .agg(min(col("id")).as("canonical"), count(lit(1)).as("n_vecs"),
        sort_array(collect_list(col("id"))).as("mem"))
    tick("comps.count")(comps.count())
    spark.stop()
  }
}
