package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q103 (ExactSubstr-style sliding-window dedup) contracts:
  *
  *  1. THE reason the operator exists: a repeated span that straddles
  *     q95's 10-token grid is invisible to the grid pass (both its
  *     grid fragments carry unique neighbor tokens) but is caught by
  *     the stride-5 windows — pinned on a crafted corpus where q95
  *     drops nothing and q103 drops exactly the straddling run.
  *  2. An all-unique corpus passes through untouched, fp = md5 of the
  *     original token join (reassembly is the identity when nothing
  *     is covered).
  *  3. The registered per-row interval filter equals an independent
  *     token-explode anti-join formulation of the same semantics on
  *     sf0.01 (where 21 hot window instances are off-grid) — the
  *     plan-shape optimization is pinned against a relational
  *     restatement inside Spark, on top of the cross-engine oracle.
  */
class Q103Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("q103").toString
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** (doc_id -> (total, n_kept, fp)); `total` is n_tokens for q103,
    * n_spans for q95 — both queries share the rest of the shape. */
  private def run(name: String, dir: String,
      totalCol: String = "n_tokens"): Map[Long, (Long, Long, String)] = {
    val out = Registry.queriesMap(name)(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long](totalCol), r.getAs[Long]("n_kept"), r.getAs[String]("fp")))
      .toMap
    Scratch.releaseAll()
    out
  }

  test("grid-straddling repeated span: q95 keeps it, q103 drops it") {
    // Per doc: 5 unique prefix tokens | 10 shared boilerplate tokens
    // (positions 5..14 — straddles the grid boundary at 10) | 15
    // unique suffix tokens. On the 10-grid, span 0 = prefix+B[0:5]
    // and span 1 = B[5:10]+suffix[0:5] are both doc-unique, so q95's
    // df never exceeds 1; the stride-5 window at start 5 is exactly B
    // in all four docs (df 4 > 2) -> q103 covers positions 5..14.
    val boiler = (0 until 10).map(k => s"b$k").mkString(" ")
    val docs = (0L until 4L).map { d =>
      val prefix = (0 until 5).map(k => s"p${d}_$k").mkString(" ")
      val suffix = (0 until 15).map(k => s"s${d}_$k").mkString(" ")
      (d, s"$prefix $boiler $suffix")
    }
    val dir = writeDocs(docs)
    val grid = run("q95_span_boilerplate", dir, totalCol = "n_spans")
    val slide = run("q103_substr_dedup", dir)
    docs.foreach { case (d, text) =>
      assert(grid(d)._2 == grid(d)._1, // q95: n_kept == n_spans
        s"q95 dropped a span of doc $d — straddle corpus is mis-crafted")
      assert(slide(d) == ((30L, 20L,
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          text.split(" ").zipWithIndex.collect {
            case (t, p) if p < 5 || p >= 15 => t
          }.mkString(" ")))),
        s"q103 must drop exactly the 10 straddling tokens of doc $d")
    }
  }

  test("all-unique corpus passes through untouched") {
    val docs = (0L until 6L).map { d =>
      (d, (0 until 23).map(k => s"u${d}_$k").mkString(" "))
    }
    val dir = writeDocs(docs)
    val slide = run("q103_substr_dedup", dir)
    docs.foreach { case (d, text) =>
      assert(slide(d) == ((23L, 23L,
        org.apache.commons.codec.digest.DigestUtils.md5Hex(text))),
        s"doc $d must be untouched with fp = md5(original tokens)")
    }
  }

  test("per-row interval filter equals token-explode anti-join on sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val registered = run("q103_substr_dedup", dir)
    assert(registered.exists { case (_, (n, k, _)) => k < n },
      "no token dropped at sf0.01; straddle coverage is vacuous")

    // Independent relational restatement: explode windows, df, hot,
    // explode COVERED POSITIONS, token-explode anti-join, reassemble.
    val tok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), " +").as("tk"))
    val wins = tok.select(col("doc_id"), size(col("tk")).as("n"), posexplode(expr(
        """transform(
          |  sequence(0, cast(greatest(0, ceil((size(tk) - 10) / 5.0)) as int)),
          |  i -> concat_ws(' ', slice(tk, i * 5 + 1, 10)))""".stripMargin)))
      .select(col("doc_id"), col("n"), (col("pos") * 5).cast("long").as("start"),
        col("col").as("win"))
    val hot = wins.groupBy(col("win")).agg(count(lit(1)).as("df")).where(col("df") > 2)
    val covered = wins.join(hot, "win")
      .select(col("doc_id"), explode(sequence(col("start"),
        least(col("start") + 10, col("n").cast("long")) - 1)).as("pos"))
      .distinct()
    val toks = tok.select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))).as("fp"))
    val alt = tok.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("fp"), lit("")).as("fp"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"), r.getAs[String]("fp")))
      .toMap
    assert(registered == alt)
  }
}
