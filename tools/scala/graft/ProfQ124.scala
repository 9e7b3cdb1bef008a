package graft

import org.apache.spark.sql.functions._

object ProfQ124 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // warm
    Registry.queriesMap("q124_capped_cluster_remove")(spark, dir).collect()
    Scratch.releaseAll()
    t("q124 end-to-end") {
      Registry.queriesMap("q124_capped_cluster_remove")(spark, dir).collect() }
    Scratch.releaseAll()
    val rem = queries.h60(concat(lit("remove:"), col("doc_id"))) % 10 === 0
    val (sig, banded0) = queries.DedupOps.sigBanded(spark, dir)
    val banded = Scratch.scoped(banded0)
    t("sig+banded count") { (sig.count(), banded.count()) }
    val (idx, pairs, standing) = t("artifacts build") {
      val a = queries.DedupOps.cappedClusterArtifacts(sig, banded, 3)
      a._1.count(); a._2.count(); a._3.count(); a
    }
    val removed = queries.t(spark, dir, "documents").where(rem).select(col("doc_id"))
    t("takedown") {
      queries.DedupOps.removeFromCappedCluster(
        idx, banded, sig, pairs, standing, removed, 3).collect() }
    Scratch.releaseAll()
    t("q117 end-to-end") {
      Registry.queriesMap("q117_cluster_remove")(spark, dir).collect() }
    Scratch.releaseAll()
    spark.stop()
  }
}
