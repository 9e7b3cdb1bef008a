package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q101's incremental-equals-batch contract: merging a batch into the
  * standing capped index (DedupOps.mergeIndexBuckets) must produce,
  * bucket for bucket, the capped index recomputed from scratch over
  * old ∪ batch — including the over-cap TOMBSTONES, whose persistence
  * is the whole point of the operator (a forgotten tombstone would
  * resurrect a hot bucket with the truncated partial id set the
  * BoundedIdBag kept). The registered q101 oracle re-proves this
  * cross-engine every round; this spec pins the Spark-side equality
  * plus the cap-boundary cases and two-batch replay convergence. */
class IndexMergeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Cap = 3

  /** banded(doc_id, band, key) fixture rows. */
  private def banded(rows: (Long, Int, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "band", "key")
  }

  private def buckets(df: org.apache.spark.sql.DataFrame): Map[(Int, String), Seq[Long]] =
    df.collect().map(r => (r.getAs[Int]("band"), r.getAs[String]("key")) ->
      r.getAs[scala.collection.Seq[Long]]("ids").toSeq).toMap

  test("cap-boundary cases: union at cap keeps, one past tombstones, tombstones persist") {
    val standing = queries.DedupOps.cappedIndexBuckets(banded(
      (1L, 0, "at_cap"), (2L, 0, "at_cap"), (3L, 0, "at_cap"), // full bucket
      (4L, 0, "room"), (5L, 0, "room"),                        // 2 of 3
      (10L, 0, "hot"), (11L, 0, "hot"), (12L, 0, "hot"), (13L, 0, "hot"), // over cap
      (20L, 0, "idx_only")), Cap)
    val batch = banded(
      (6L, 0, "at_cap"),               // 3 + 1 > cap -> crosses to tombstone
      (7L, 0, "room"),                 // 2 + 1 = cap -> keeps, exactly at boundary
      (14L, 0, "hot"),                 // tombstone persists
      (30L, 0, "new_key"),             // batch-only bucket
      (40L, 0, "new_hot"), (41L, 0, "new_hot"),
      (42L, 0, "new_hot"), (43L, 0, "new_hot")) // batch-alone over cap
    val merged = buckets(queries.DedupOps.mergeIndexBuckets(standing, batch, Cap))
    assert(merged((0, "at_cap")) == Seq.empty, "cap+1 union must tombstone")
    assert(merged((0, "room")) == Seq(4L, 5L, 7L), "union exactly at cap must keep, sorted")
    assert(merged((0, "hot")) == Seq.empty, "standing tombstone must persist")
    assert(merged((0, "idx_only")) == Seq(20L), "untouched bucket must pass through")
    assert(merged((0, "new_key")) == Seq(30L), "batch-only bucket must appear")
    assert(merged((0, "new_hot")) == Seq.empty, "batch-alone over-cap must tombstone")
    assert(merged.size == 6)
  }

  test("redelivered / overlapping ids merge idempotently (r10 ADVICE)") {
    // At-least-once redelivery: the batch repeats ids the index
    // already holds. The distinct union must (a) not double-count the
    // repeats toward the cap, (b) not keep duplicate ids, and (c) be
    // idempotent — re-merging the same batch changes nothing.
    val standing = queries.DedupOps.cappedIndexBuckets(banded(
      (1L, 0, "redeliver"), (2L, 0, "redeliver"),  // 2 of 3
      (4L, 0, "overlap"), (5L, 0, "overlap")), Cap)
    val batch = banded(
      (1L, 0, "redeliver"), (2L, 0, "redeliver"),  // pure redelivery
      (5L, 0, "overlap"), (6L, 0, "overlap"))      // one repeat + one new
    val once = queries.DedupOps.mergeIndexBuckets(standing, batch, Cap)
    val onceB = buckets(once)
    assert(onceB((0, "redeliver")) == Seq(1L, 2L),
      "pure redelivery must not change the bucket (a raw size-sum would tombstone it)")
    assert(onceB((0, "overlap")) == Seq(4L, 5L, 6L),
      "overlapping id must count once toward the cap and appear once")
    val twice = buckets(queries.DedupOps.mergeIndexBuckets(once, batch, Cap))
    assert(twice == onceB, "re-merging the same batch must be a no-op")
  }

  // cap per sf: the registered cap (3) already tombstones at sf0.001
  // (full-corpus max bucket 4); sf0.01's buckets top out at EXACTLY 3
  // (the q91/q92 declare-vs-fire split, documented on q101), so that
  // case tightens to cap 2 to keep the tombstone branch exercised.
  for ((sf, cap) <- Seq(("sf0.001", 3), ("sf0.01", 2))) {
    test(s"incremental merge equals batch recompute on $sf (cap $cap)") {
      val dir = s"/root/testdata/$sf"
      val inc = queries.h60(concat(lit("ingest:"), col("doc_id"))) % 10 === 0
      val standing = queries.DedupOps.cappedIndexBuckets(
        queries.DedupOps.bandedFor(spark, dir, !inc), cap)
      val merged = buckets(queries.DedupOps.mergeIndexBuckets(
        standing, queries.DedupOps.bandedFor(spark, dir, inc), cap))
      val recomputed = buckets(queries.DedupOps.cappedIndexBuckets(
        queries.DedupOps.bandedFor(spark, dir, lit(true)), cap))
      Scratch.releaseAll()
      assert(merged.exists(_._2.isEmpty), "no tombstone exercised; test is vacuous")
      assert(merged == recomputed)
    }
  }

  // The EMBEDDING instance (q102): same operator over the q97
  // sign-LSH banding. The registered q102 cap (56, q97's production
  // index cap) is above the sf bucket occupancies, so these cases
  // fire the tombstone branch where the registered oracle cannot:
  // sf0.01 at a tightened cap, and sf0.1 at the PRODUCTION cap
  // itself (max bucket 75 > 56 there — real parameters, real
  // tombstones, merged == recomputed).
  for ((sf, cap) <- Seq(("sf0.01", 12), ("sf0.1", 56))) {
    test(s"embedding-index merge equals batch recompute on $sf (cap $cap)") {
      val dir = s"/root/testdata/$sf"
      // pred runs over `embeddings` BEFORE the vec_id -> doc_id rename,
      // so it references vec_id (same split expression as q102's).
      val inc = queries.h60(concat(lit("ingest:"), col("vec_id"))) % 10 === 0
      val standing = queries.DedupOps.cappedIndexBuckets(
        queries.DedupOps.embBandedFor(spark, dir, !inc), cap)
      val merged = bucketsI(queries.DedupOps.mergeIndexBuckets(
        standing, queries.DedupOps.embBandedFor(spark, dir, inc), cap))
      val recomputed = bucketsI(queries.DedupOps.cappedIndexBuckets(
        queries.DedupOps.embBandedFor(spark, dir, lit(true)), cap))
      Scratch.releaseAll()
      assert(merged.exists(_._2.isEmpty), "no tombstone exercised; test is vacuous")
      assert(merged == recomputed)
    }
  }

  /** [[buckets]] for the embedding banding's Int keys. */
  private def bucketsI(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Seq[Long]] =
    df.collect().map(r => (r.getAs[Int]("band"), r.getAs[Int]("key")) ->
      r.getAs[scala.collection.Seq[Long]]("ids").toSeq).toMap

  test("two-batch replay converges to the recomputed index (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val cap = 2 // tighter cap: more boundary crossings across the two merges
    val m = queries.h60(concat(lit("ingest:"), col("doc_id"))) % 10
    val standing = queries.DedupOps.cappedIndexBuckets(
      queries.DedupOps.bandedFor(spark, dir, m >= 2), cap)
    val afterA = queries.DedupOps.mergeIndexBuckets(
      standing, queries.DedupOps.bandedFor(spark, dir, m === 0), cap)
    val afterB = buckets(queries.DedupOps.mergeIndexBuckets(
      afterA, queries.DedupOps.bandedFor(spark, dir, m === 1), cap))
    val recomputed = buckets(queries.DedupOps.cappedIndexBuckets(
      queries.DedupOps.bandedFor(spark, dir, lit(true)), cap))
    Scratch.releaseAll()
    assert(afterB == recomputed)
  }
}
