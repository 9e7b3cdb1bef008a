package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl._

/** Sub-stage profiler for the q45 dedupe path at bench parallelism. */
object Prof3 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val raw = t("raw+collectWarm")(Synth.contacts(spark, dir))
    val norm = t("norm.checkpoint")(Pipeline.normalize(raw).localCheckpoint(true))
    val slim = t("slim.checkpoint")(norm.map(ContactLogic.toMatchRec).localCheckpoint(true))
    val edges = Pipeline.acceptedPairs(norm)
    t("edges.count")(println(edges.count()))
    val edgesP = edges.persist()
    t("edges.persist")(println(edgesP.count()))
    val comps = t("components")(Pipeline.connectedComponents(
      norm.select(col("row_id").as[java.lang.Long]), edgesP))
    t("comps.count")(println(comps.count()))
    val withComp = norm.joinWith(raw, norm("row_id") === raw("row_id"))
      .toDF("norm", "raw")
      .join(comps, col("norm.row_id") === comps("id"))
      .select(col("comp"), col("norm"), col("raw"))
      .as[(Long, Contact, Contact)]
    val merged = withComp.groupByKey(_._1).mapGroups { (_, it) =>
      val members = it.toSeq.sortBy(_._2.row_id).map(x => (x._2, x._3))
      ContactLogic.mergeCluster(members)
    }
    t("merge.count")(println(merged.count()))
    t("merge.again")(println(merged.count()))
    spark.stop()
  }
}
