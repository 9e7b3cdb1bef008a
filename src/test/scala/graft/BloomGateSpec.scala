package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q104's Bloom-gate contract. The gate's value claim is twofold:
  * NO FALSE NEGATIVES (a train doc sharing an eval shingle always
  * flags — Bloom filters cannot miss a present element) and
  * DETERMINISTIC false positives (the oracle recomputes the same bit
  * positions, so the FP tail is cross-engine exact, proven by the
  * registered q104 hash gate at sf0.01 where ~6 FP docs fire). This
  * spec pins the pieces the oracle can't see in isolation: the
  * build-side Catalyst arithmetic vs the probe-side kernel, the
  * subset invariants against an independent exact join, and a
  * forced-saturation instance where EVERY probe is a hit. */
class BloomGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  /** The spec's own bit test over a bloomBitset word array. */
  private def isSet(words: Array[Long], pos: Long): Boolean =
    ((words((pos >> 6).toInt) >> (pos & 63).toInt) & 1L) != 0L

  test("build-side Catalyst positions equal the kernel's bloomPositions") {
    val s = spark
    import s.implicits._
    val m = 1L << 18
    val k = 4 // wider than registered: pins the general-j arithmetic
    val rnd = new scala.util.Random(20260815L)
    val hashes = Seq.fill(500)(rnd.nextLong() & ((1L << 60) - 1))
    // The exact expressions bloomBitset builds its positions from.
    val posCols = (0 until k).map { j =>
      ((col("h") % m + lit(j) * ((shiftright(col("h"), 30) % (m - 1)) + 1L)) % m)
        .as(s"p$j")
    }
    val got = hashes.toDF("h").select(col("h") +: posCols: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong).toSeq).toMap
    hashes.foreach { h =>
      assert(got(h) == queries.TextOps.bloomPositions(h, m, k).toSeq,
        s"Catalyst and kernel disagree on positions of $h")
    }
  }

  test("no false negatives: every inserted hash probes positive") {
    val s = spark
    import s.implicits._
    val m = 1L << 14
    val k = 2
    val rnd = new scala.util.Random(42L)
    val inserted = Seq.fill(2000)(rnd.nextLong() & ((1L << 60) - 1))
    val words = queries.TextOps.bloomBitset(inserted.toDF("h"), m, k)
    inserted.foreach { h =>
      assert(queries.TextOps.bloomPositions(h, m, k).forall(isSet(words, _)),
        s"inserted hash $h must have every position set")
    }
  }

  /** Independent exact contamination relation: train-doc -> count of
    * distinct shingles shared with the eval split, via a plain join
    * (no bloom anywhere). */
  private def exactContam(): Map[Long, Long] = {
    val sh8 = queries.shingleH60Udf(8)
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        (queries.h60(concat(lit("split:"), col("doc_id"))) % 100).as("b"),
        split(trim(col("text")), " +").as("toks"))
      .where(size(col("toks")) >= 8)
    val evalSh = base.where(col("b") >= 90)
      .select(explode(sh8(col("toks"))).as("h")).distinct()
    base.where(col("b") < 90)
      .select(col("doc_id"), explode(sh8(col("toks"))).as("h"))
      .join(evalSh, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("registered instance at sf0.001: exact join agreement + subset invariants") {
    val out = queries.TextOps.bloomGateFor(spark, sfDir, 1L << 18, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val exact = exactContam()
    // No false negatives: every exactly-contaminated doc is flagged,
    // with the exact join's count.
    val outExact = out.collect { case (id, _, ne, _) if ne > 0 => id -> ne }.toMap
    assert(outExact == exact,
      "flagged docs with n_exact > 0 must be exactly the exact-join relation")
    out.foreach { case (id, nb, ne, fp) =>
      assert(ne <= nb, s"doc $id: exact hits ($ne) must be <= bloom hits ($nb)")
      assert(nb >= 1, s"doc $id flagged with zero bloom hits")
      assert(fp == (ne == 0), s"doc $id: bloom_fp must mean n_exact == 0")
    }
  }

  test("saturated filter (m=64): every train shingle hits, exact counts unchanged") {
    val s = spark
    import s.implicits._
    val sh8 = queries.shingleH60Udf(8)
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        (queries.h60(concat(lit("split:"), col("doc_id"))) % 100).as("b"),
        split(trim(col("text")), " +").as("toks"))
      .where(size(col("toks")) >= 8)
    val evalSh = base.where(col("b") >= 90)
      .select(explode(sh8(col("toks"))).as("h")).distinct()
    val words = queries.TextOps.bloomBitset(evalSh, 64L, 2)
    assume(words.length == 1 && words(0) == -1L,
      "sf0.001's 2.2k eval hashes saturate a 64-bit filter")
    val out = queries.TextOps.bloomGateFor(spark, sfDir, 64L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // All bits set -> n_bloom is the doc's full distinct-shingle count
    // and every train doc with >= 1 shingle flags.
    val perDoc = base.where(col("b") < 90)
      .select(col("doc_id"), size(array_distinct(sh8(col("toks")))).cast("long").as("n"))
      .where(col("n") >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(_._1).toSet == perDoc.keySet,
      "a saturated filter must flag every train doc that has a shingle")
    out.foreach { case (id, nb, _) =>
      assert(nb == perDoc(id), s"doc $id: saturated n_bloom must equal shingle count")
    }
    // The FP flood changes NOTHING about the exact counts.
    assert(out.collect { case (id, _, ne) if ne > 0 => id -> ne }.toMap == exactContam(),
      "exact verification must be invariant to the filter's FP rate")
  }
}
