package graft

import graft.queries.CurationOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Intrinsic invariants of the curation operators (q80–q84) that the
  * DuckDB oracle cannot express as value equality: the salted
  * stratified sampler must equal the single-window plan it replaces,
  * the shard manifest must partition the corpus, and the gate verdict
  * must be exactly the conjunction of its per-rule flags.
  */
class CurationOpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q81 salted two-stage top-k equals the single-window sample") {
    import graft.queries.h60
    val docs = graft.queries.t(spark, dir, "documents")
    val naive = docs
      .select(col("doc_id"), col("lang"), col("source"), h60(col("doc_id")).as("hk"))
      .withColumn("rk", row_number().over(Window
        .partitionBy(col("lang"), col("source")).orderBy(col("hk"), col("doc_id"))))
      .where(col("rk") <= 5)
      .select(col("lang"), col("source"), col("rk"), col("doc_id"))
    val salted = CurationOps.q81.run(spark, dir)
    assert(salted.exceptAll(naive).isEmpty && naive.exceptAll(salted).isEmpty)
    Scratch.releaseAll()
  }

  test("q84 shards partition the corpus exactly") {
    val docs = graft.queries.t(spark, dir, "documents")
    val manifest = CurationOps.q84.run(spark, dir).collect()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // Every shard key is one lowercase hex nibble; doc ranges overlap
    // shards (the whole point of the shuffle) but bounds stay sane.
    assert(manifest.forall(r => "0123456789abcdef".contains(r.getAs[String]("shard"))))
    assert(manifest.forall(r =>
      r.getAs[Long]("min_doc") <= r.getAs[Long]("max_doc")))
    Scratch.releaseAll()
  }

  test("q83 keep is exactly the conjunction of its per-rule flags") {
    val gate = CurationOps.q83.run(spark, dir)
    val bad = gate.where(col("keep") =!=
      (col("f_len") === 1 && col("f_mean") === 1 &&
        col("f_stop") === 1 && col("f_alpha") === 1).cast("int"))
    assert(bad.isEmpty)
    Scratch.releaseAll()
  }

  test("q80 boilerplate shingles really clear the df threshold") {
    // Recompute the boilerplate set brute-force and check every doc's
    // n_boiler against it.
    val docs = graft.queries.t(spark, dir, "documents")
    val sh = docs.select(col("doc_id"),
        split(trim(col("text")), " +").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("toks")) - 2),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))))
        .as("s"))
    val nDocs = sh.select(col("doc_id")).distinct().count()
    val boiler = sh.groupBy(col("s")).agg(count(lit(1)).as("c"))
      .where(col("c") * 5 >= nDocs).select(col("s"))
    val expected = sh.join(boiler, Seq("s"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("e"))
    val got = CurationOps.q80.run(spark, dir)
    val joined = got.join(expected, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_boiler"),
        coalesce(col("e"), lit(0L)).as("e"))
    assert(joined.where(col("n_boiler") =!= col("e")).isEmpty)
    Scratch.releaseAll()
  }

  test("q82 kept docs all start under the budget and order is hash-deterministic") {
    import graft.queries.h60
    val docs = graft.queries.t(spark, dir, "documents")
    val budget = 20000L
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val kept = docs.select(col("source"), col("doc_id"), h60(col("doc_id")).as("hk"),
        size(split(trim(col("text")), " +")).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .where(col("cum_before") < budget)
    val expected = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("mix_tokens"))
    val got = CurationOps.q82.run(spark, dir)
      .select(col("source"), col("n_docs"), col("mix_tokens"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    Scratch.releaseAll()
  }
}
