package graft

import graft.queries.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-9 scale-parameterized sketches:
  *
  *  - q92 (64-bit simhash, banded): an 8-bit band width has PERFECT
  *    recall of the hamming ≤ 6 relation by pigeonhole (6 bit errors
  *    can dirty at most 6 of 8 bands, so one band always matches) —
  *    pinned against a brute-force all-pairs hamming join. The 16-bit
  *    registered width must be a subset of the 8-bit one, and the
  *    bucket cap must only ever REMOVE pairs.
  *  - q91 (banded Rademacher sign-LSH over embeddings): every emitted
  *    pair must be a true cosine ≥ threshold pair (soundness against
  *    brute force); near-identical vectors must be recovered; a hot
  *    identical-direction blob must be dropped by the cap without
  *    touching unrelated pairs.
  */
class ScaledSketchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def docPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val rows = df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Scratch.releaseAll()
    rows
  }

  test("simhash64 with 8-bit bands equals brute-force hamming <= 6 (pigeonhole recall)") {
    val banded = docPairs(DedupOps.simhash64Pairs(spark, dir, 8, 6, Int.MaxValue - 1))
    // Truth device: a 1-bit band width gives 64 single-bit bands, and
    // hamming <= 6 can dirty at most 6 of them — 58 clean bands
    // always remain, so candidate recall of the hamming <= 6 relation
    // is exact there too, by the same pigeonhole but with slack 58
    // instead of 2. Each 1-bit band has only 2 buckets (half the
    // corpus each), i.e. this runs close to all-pairs — fine at
    // sf0.001, which is why it serves as the brute-force reference.
    val truth = docPairs(DedupOps.simhash64Pairs(spark, dir, 1, 6, Int.MaxValue - 1))
    assert(truth.nonEmpty, "corpus produced no hamming<=6 pairs; test is vacuous")
    assert(banded == truth,
      s"8-bit-band recall hole: ${(truth -- banded).take(5)} missing, ${(banded -- truth).take(5)} extra")
  }

  test("registered 16-bit band width is a subset of the 8-bit width") {
    val b16 = docPairs(DedupOps.simhash64Pairs(spark, dir, 16, 6, Int.MaxValue - 1))
    val b8 = docPairs(DedupOps.simhash64Pairs(spark, dir, 8, 6, Int.MaxValue - 1))
    assert(b16.subsetOf(b8))
    assert(b16.nonEmpty)
  }

  test("simhash64 bucket cap only removes pairs; hot bucket is dropped") {
    // 6 byte-identical docs share every band bucket; cap 3 must drop
    // them all. A distinct exact-dup pair (bucket of 2) survives.
    val hot = (0L to 5L).map(i => (i, "alpha beta gamma delta epsilon zeta eta"))
    val pair = Seq((10L, "one two three four five six seven eight"),
      (11L, "one two three four five six seven eight"))
    val singles = (20L to 25L).map(i =>
      (i, s"lone$i word${i * 7} tail${i * 13} more${i * 17} end${i * 19} x${i * 23}"))
    val tmp = java.nio.file.Files.createTempDirectory("q92spec").toString
    spark.createDataFrame(hot ++ pair ++ singles).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val capped = docPairs(DedupOps.simhash64Pairs(spark, tmp, 16, 6, 3))
    assert(capped == Set((10L, 11L)))
    val uncapped = docPairs(DedupOps.simhash64Pairs(spark, tmp, 16, 6, 100))
    assert(uncapped.size == 16 && uncapped.contains((0L, 5L))) // C(6,2) + 1
  }

  private def vecPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val rows = df.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Scratch.releaseAll()
    rows
  }

  test("q91 pairs are sound: subset of brute-force cosine >= threshold (sf0.001)") {
    val lsh = vecPairs(Registry.queriesMap("q91_embedding_lsh_scaled")(spark, dir))
    val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      graft.plans.VecDotProduct(x, y)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("cos"))
      .where(col("cos") >= 0.35)
    val truth = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty && lsh.subsetOf(truth),
      s"unsound pairs: ${(lsh -- truth).take(5)}")
  }

  test("q91 recovers near-identical vectors; hot blob is capped away (crafted)") {
    // Base direction u (hash-noise), cluster = u plus tiny per-member
    // tilt (cosine ~0.9998); blob = 12 copies of a far direction w.
    // With cap 8 the blob's buckets are over cap in every band -> no
    // blob pair; the 3-vector cluster and nothing else must survive.
    def noise(seed: Long, i: Int): Float = {
      // splitmix-style mix: a plain linear hash left ids 7 apart
      // correlated enough to pair up at cosine 0.8.
      var z = seed * 1000003L + i + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      ((z & 0xfffffL) / 524287.5 - 1.0).toFloat
    }
    val u = Array.tabulate(64)(i => noise(1, i))
    val w = Array.tabulate(64)(i => noise(99, i))
    val cluster = (0 until 3).map { m =>
      (m.toLong, u.zipWithIndex.map { case (x, i) => x + 0.01f * noise(10 + m, i) }.toSeq)
    }
    val blob = (100 until 112).map(id => (id.toLong, w.toSeq))
    val singles = (200 until 210).map(id => (id.toLong,
      Array.tabulate(64)(i => noise(id.toLong, i)).toSeq))
    val tmp = java.nio.file.Files.createTempDirectory("q91spec").toString
    spark.createDataFrame(cluster ++ blob ++ singles)
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val capped = vecPairs(DedupOps.embeddingPairsScaled(spark, tmp, 4, 4, 8, 0.8))
    assert(capped == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"expected exactly the 3-vector cluster, got $capped")
    val uncapped = vecPairs(DedupOps.embeddingPairsScaled(spark, tmp, 4, 4, 100, 0.8))
    assert(uncapped.size == 3 + 66) // cluster + C(12,2) blob pairs
  }
}
