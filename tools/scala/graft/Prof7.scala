package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl._

/** Warm sub-stage profile of the q45 dedupe path: run the whole path
  * once at sf0.001 (codegen/analysis warm, mirroring Bench's warmup),
  * then time each sub-stage at the target SF. */
object Prof7 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val warmDir = new java.io.File(new java.io.File(dir).getParentFile, "sf0.001").getPath

    def path(d: String, label: String): Unit = {
      val raw = t(s"$label.raw")(Synth.contacts(spark, d).localCheckpoint(true))
      val norm = t(s"$label.norm")(Pipeline.normalize(raw).localCheckpoint(true))
      val edges = Pipeline.acceptedPairs(norm)
      t(s"$label.edges") { println(edges.count()) }
      val edgesP = edges.persist()
      edgesP.count()
      val comps = t(s"$label.cc")(Pipeline.connectedComponents(
        norm.select(col("row_id").as[java.lang.Long]), edgesP))
      val withComp = norm.joinWith(raw, norm("row_id") === raw("row_id"))
        .toDF("norm", "raw")
        .join(comps, col("norm.row_id") === comps("id"))
        .select(col("comp"), col("norm"), col("raw"))
        .as[(Long, Contact, Contact)]
      val merged = withComp.groupByKey(_._1).mapGroups { (_, it) =>
        val members = it.toSeq.sortBy(_._2.row_id).map(x => (x._2, x._3))
        ContactLogic.mergeCluster(members)
      }
      t(s"$label.merge") { println(merged.count()) }
      edgesP.unpersist()
      Scratch.releaseAll()
    }
    path(warmDir, "warm")
    for (i <- 1 to 4) path(dir, s"timed$i")
    spark.stop()
  }
}
