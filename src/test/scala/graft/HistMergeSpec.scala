package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q112's merge arithmetic and its incremental == batch identity. The
  * registered oracle proves the identity cross-engine on the h60
  * split; this spec (a) pins the merge on crafted histograms with
  * one-sided keys, (b) fires the case the sf corpora may not — a
  * batch that MOVES a quantile — and (c) replays merged == direct
  * recompute at sf0.001 in-engine. */
class HistMergeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hist(rows: Seq[(String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("lang", "n", "c")
  }

  test("merge arithmetic: counts add; one-sided keys pass through") {
    val standing = hist(Seq(("en", 10L, 5L), ("en", 20L, 3L), ("de", 7L, 1L)))
    val batch = hist(Seq(("en", 10L, 2L), ("en", 30L, 4L), ("fr", 9L, 6L)))
    val merged = queries.CurationOps.mergeHist(standing, batch)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == Map(
      ("en", 10L) -> 7L, ("en", 20L) -> 3L, ("en", 30L) -> 4L,
      ("de", 7L) -> 1L, ("fr", 9L) -> 6L))
  }

  test("a batch that moves the quantiles: merged quantiles equal the union's") {
    // Standing: 99 docs of length 10 -> p50=p90=p99=10.
    // Batch: 20 docs of length 50 -> union of 119: p90 index
    // ceil(.9*119)=108 > 99 -> p90 moves to 50; p50 stays 10.
    val standing = hist(Seq(("en", 10L, 99L)))
    val batch = hist(Seq(("en", 50L, 20L)))
    val q = queries.CurationOps.quantilesOf(
        queries.CurationOps.mergeHist(standing, batch))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(q.toSeq == Seq((10L, 50L, 50L, 119L)),
      s"p90/p99 must move to the batch's tail, p50 must not: ${q.toSeq}")
  }

  test("decrement arithmetic: counts subtract; zero-count keys drop; others pass") {
    val standing = hist(Seq(
      ("en", 10L, 5L), ("en", 20L, 3L), ("en", 30L, 2L), ("de", 7L, 1L)))
    val removed = hist(Seq(
      ("en", 10L, 2L),  // partial: 5 - 2 = 3 stays
      ("en", 20L, 3L))) // total: 3 - 3 = 0 -> key leaves the table
    val out = queries.CurationOps.removeFromHist(standing, removed)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("en", 10L) -> 3L, ("en", 30L) -> 2L, ("de", 7L) -> 1L))
  }

  test("a removal that moves the quantiles back: the merge test inverted") {
    // Union of 119 (99×len-10 + 20×len-50) has p90 = p99 = 50; removing
    // the 20 tail docs must move both back to 10 — the exact inverse of
    // the merge-moves-quantiles case above.
    val standing = hist(Seq(("en", 10L, 99L), ("en", 50L, 20L)))
    val removed = hist(Seq(("en", 50L, 20L)))
    val q = queries.CurationOps.quantilesOf(
        queries.CurationOps.removeFromHist(standing, removed))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(q.toSeq == Seq((10L, 10L, 10L, 99L)),
      s"p90/p99 must move back to 10 after the tail is removed: ${q.toSeq}")
  }

  test("merge then decrement of the same batch round-trips to the standing histogram") {
    val standing = hist(Seq(("en", 10L, 5L), ("de", 7L, 1L)))
    val batch = hist(Seq(("en", 10L, 2L), ("en", 30L, 4L), ("fr", 9L, 6L)))
    val rt = queries.CurationOps.removeFromHist(
        queries.CurationOps.mergeHist(standing, batch), batch)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rt == Map(("en", 10L) -> 5L, ("de", 7L) -> 1L))
  }

  test("sf0.001 replay: decremented histogram quantiles equal the survivors' recompute") {
    val dir = "/root/testdata/sf0.001"
    val rem = queries.h60(concat(lit("remove:"), col("doc_id"))) % 10 === 0
    val out = Registry.queriesMap("q118_quantile_remove")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val direct = queries.CurationOps.quantilesOf(
        queries.CurationOps.tokenHistFor(spark, dir, !rem))
      .collect().map(_.toSeq).toSeq
    assert(out == direct, "decrement must equal recompute over survivors")
    val nRem = queries.CurationOps.tokenHistFor(spark, dir, rem)
      .agg(sum(col("c"))).collect()(0).getLong(0)
    assert(nRem > 0, "takedown batch empty: replay vacuous")
  }

  test("sf0.001 replay: merged histogram quantiles equal the direct q107 output") {
    val dir = "/root/testdata/sf0.001"
    val direct = Registry.queriesMap("q107_exact_quantiles")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val merged = Registry.queriesMap("q112_quantile_merge")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(merged == direct, "incremental must equal batch recompute")
    // Non-vacuous: both split sides are populated.
    val inc = queries.h60(concat(lit("qtile:"), col("doc_id"))) % 10 === 0
    val nInc = queries.CurationOps.tokenHistFor(spark, dir, inc)
      .agg(sum(col("c"))).collect()(0).getLong(0)
    val nIdx = queries.CurationOps.tokenHistFor(spark, dir, !inc)
      .agg(sum(col("c"))).collect()(0).getLong(0)
    assert(nInc > 0 && nIdx > 0, s"split degenerate: inc=$nInc idx=$nIdx")
  }
}
