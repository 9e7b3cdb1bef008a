package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q107's quantile definition, pinned against the straightforward
  * sorted-list (type-1 / discrete) recompute on crafted distributions
  * with skew, ties, and tiny strata — the shapes where an
  * off-by-one in the cumulative test silently returns a neighbor
  * element. The registered oracle re-proves the same arithmetic
  * cross-engine every round; this spec proves the arithmetic IS the
  * textbook definition. */
class QuantilesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Type-1 quantile: smallest element whose cumulative count reaches
    * ceil(p/100 * n) — the definition q107's integer test encodes. */
  private def qtile(xs: Seq[Long], p: Int): Long = {
    val s = xs.sorted
    s(((p * xs.size + 99) / 100) - 1)
  }

  test("crafted distributions: p50/p90/p99 equal the sorted-list type-1 definition") {
    // Lang "sk": heavy skew (90x one value, long tail). "ti": all
    // ties. "on": a single doc. "tw": two docs (p50 must be the FIRST
    // at even split: ceil(0.5*2)=1). "rn": 100 distinct values so the
    // percentile indices are exact decade boundaries.
    val langs = Map(
      "sk" -> (Seq.fill(90)(7L) ++ Seq(1L, 2L, 3L, 900L, 901L, 902L, 903L, 904L, 905L, 906L)),
      "ti" -> Seq.fill(25)(42L),
      "on" -> Seq(13L),
      "tw" -> Seq(5L, 6L),
      "rn" -> new scala.util.Random(3L).shuffle((1L to 100L).toVector))
    val rows = langs.toSeq.flatMap { case (lang, ns) =>
      ns.map(n => (lang, ("x " * n.toInt).trim))
    }.zipWithIndex.map { case ((lang, text), i) =>
      (i.toLong, text, lang, "s0", 0L)
    }
    val tmp = java.nio.file.Files.createTempDirectory("q107spec").toString
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = Registry.queriesMap("q107_exact_quantiles")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == langs.keySet)
    for ((lang, ns) <- langs) {
      val expect = (qtile(ns, 50), qtile(ns, 90), qtile(ns, 99), ns.size.toLong)
      assert(got(lang) == expect,
        s"$lang: got ${got(lang)}, sorted-list definition says $expect")
    }
  }
}
