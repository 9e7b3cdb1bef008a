package graft

import org.apache.spark.sql.functions._

object ProfQ124b {
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
    val cap = 3
    val rem = queries.h60(concat(lit("remove:"), col("doc_id"))) % 10 === 0
    val (sig, banded0) = queries.DedupOps.sigBanded(spark, dir)
    val banded = Scratch.scoped(banded0)
    val (idx, pairs, standing) = queries.DedupOps.cappedClusterArtifacts(sig, banded, cap)
    idx.count(); pairs.count(); standing.count(); banded.count(); sig.count()
    val removed = queries.t(spark, dir, "documents").where(rem).select(col("doc_id"))
    // replicate removeFromCappedCluster stage by stage
    val postIdx = t("postIdx (count)") {
      val p = Scratch.scoped(queries.DedupOps.removeFromIndexBuckets(idx, banded, removed, cap))
      p.count(); p }
    val demoted = t("demoted (count)") {
      val d = Scratch.scoped(idx.where(size(col("ids")) === 0)
        .select(col("band"), col("key"))
        .join(postIdx.where(size(col("ids")) > 0).select(col("band"), col("key")),
          Seq("band", "key"), "left_semi"))
      d.count(); d }
    val mem = banded.join(demoted, Seq("band", "key"), "left_semi")
      .join(removed, Seq("doc_id"), "left_anti")
    val revealedCand = t("revealedCand (count)") {
      val r = Scratch.scoped(mem.as("a").join(mem.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct())
      r.count(); r }
    val revealed = t("revealed verify (count)") {
      val probeIds = revealedCand.select(col("doc_a").as("doc_id"))
        .union(revealedCand.select(col("doc_b").as("doc_id"))).distinct()
      val sigPruned = sig.join(broadcast(probeIds), Seq("doc_id"), "left_semi")
      val rv = Scratch.scoped(queries.DedupOps.verifiedPairs(sigPruned, revealedCand)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")))
      rv.count(); rv }
    val rm = t("removeFromComponents") {
      val r = Scratch.scoped(queries.DedupOps.removeFromComponents(standing, pairs,
        removed.select(col("doc_id").as("id"))))
      r.count(); r }
    t("mergeComponents") {
      queries.DedupOps.mergeComponents(rm, revealed).collect() }
    spark.stop()
  }
}
