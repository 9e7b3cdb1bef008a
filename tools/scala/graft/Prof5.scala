package graft

import org.apache.spark.sql.SparkSession
import graft.etl._
import graft.sources.Sources

/** Stage profile of the file-based consolidate path (ConsolidateMain). */
object Prof5 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val Array(li, gm, vc) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val liDs = t("linkedin")(Sources.linkedin(spark, li).localCheckpoint(true))
    println(liDs.count())
    val gmDs = t("gmail")(Sources.gmail(spark, gm).localCheckpoint(true))
    println(gmDs.count())
    val vcDs = t("vcf")(Sources.vcards(spark, vc).localCheckpoint(true))
    println(vcDs.count())
    val raw = t("loadAll")(Sources.loadAll(spark, li, gm, vc).localCheckpoint(true))
    println(raw.count())
    val norm = t("normalize")(Pipeline.normalize(raw).localCheckpoint(true))
    println(norm.count())
    val (merged, lineage) = Pipeline.dedupeAndMerge(norm, raw)
    t("merge+edges")(println(merged.count()))
    t("lineage")(println(lineage.count()))
    t("artifacts")(Artifacts.writeConsolidated(merged, lineage, "/tmp/prof5_out"))
    spark.stop()
  }
}
