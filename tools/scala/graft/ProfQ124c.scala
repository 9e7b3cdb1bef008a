package graft

import org.apache.spark.sql.functions._

object ProfQ124c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val cap = 3
    val rem = queries.h60(concat(lit("remove:"), col("doc_id"))) % 10 === 0
    val (sig, banded0) = queries.DedupOps.sigBanded(spark, dir)
    val banded = Scratch.scoped(banded0)
    val (idx, pairs, standing) = queries.DedupOps.cappedClusterArtifacts(sig, banded, cap)
    idx.count(); pairs.count(); standing.count(); banded.count(); sig.count()
    val removed = queries.t(spark, dir, "documents").where(rem).select(col("doc_id"))
    val postIdx = Scratch.scoped(queries.DedupOps.removeFromIndexBuckets(idx, banded, removed, cap)); postIdx.count()
    val demoted = Scratch.scoped(idx.where(size(col("ids")) === 0)
      .select(col("band"), col("key"))
      .join(postIdx.where(size(col("ids")) > 0).select(col("band"), col("key")),
        Seq("band", "key"), "left_semi")); demoted.count()
    val mem = banded.join(demoted, Seq("band", "key"), "left_semi")
      .join(removed, Seq("doc_id"), "left_anti")
    val revealedCand = Scratch.scoped(mem.as("a").join(mem.as("b"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct())
    val probeIds = revealedCand.select(col("doc_a").as("doc_id"))
      .union(revealedCand.select(col("doc_b").as("doc_id"))).distinct()
    val sigPruned = sig.join(broadcast(probeIds), Seq("doc_id"), "left_semi")
    val revealed = Scratch.scoped(queries.DedupOps.verifiedPairs(sigPruned, revealedCand)
      .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    println("revealed=" + revealed.count())
    val rm = Scratch.scoped(queries.DedupOps.removeFromComponents(standing, pairs,
      removed.select(col("doc_id").as("id")))); println("rm=" + rm.count())
    // inline mergeComponents with stage timings
    val contracted = t("contracted count") {
      val c = Scratch.scoped(revealed
        .join(rm.select(col("id").as("src"), col("comp").as("sc")), Seq("src"), "left")
        .join(rm.select(col("id").as("dst"), col("comp").as("dc")), Seq("dst"), "left")
        .select(coalesce(col("sc"), col("src")).as("src"),
          coalesce(col("dc"), col("dst")).as("dst"))
        .where(col("src") =!= col("dst")).distinct())
      println("contracted=" + c.count()); c }
    val remap = t("connectedComponents") {
      val verts = contracted.select(col("src")).union(contracted.select(col("dst")))
        .distinct().as[java.lang.Long]
      val r = graft.etl.Pipeline.connectedComponents(verts, contracted.as[graft.etl.Pipeline.Edge])
      println("remap=" + r.count()); r }
    val standingFinal = t("standingFinal count") {
      val sf = rm.join(remap.select(col("id").as("comp"), col("comp").as("fc")), Seq("comp"), "left")
        .select(col("id"), coalesce(col("fc"), col("comp")).as("comp"))
      println("sf=" + sf.count()); sf }
    val newFinal = t("newFinal count") {
      val nf = revealed.select(col("src").as("id"))
        .union(revealed.select(col("dst").as("id"))).distinct()
        .join(rm.select(col("id")), Seq("id"), "left_anti")
        .join(remap, Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      println("nf=" + nf.count()); nf }
    t("union collect") { standingFinal.union(newFinal).collect() }
    spark.stop()
  }
}
