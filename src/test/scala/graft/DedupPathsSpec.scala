package graft

import graft.queries.DedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan parity for q53's adaptive join: the prefix-filter
  * path (the plan a 100 TB vocabulary selects) must compute exactly
  * the pairs the bitset path computes. Test corpora never exceed the
  * 16384-gram bound, so without forcing the path here the scale plan
  * would ship untested.
  */
class DedupPathsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // broadcastCeiling = Long.MaxValue pins the PATH, not just the
  // inputs (r10 ADVICE): the registered heap-derived ceiling could,
  // on a small-heap test JVM, silently demote the "forced broadcast"
  // cases below to prefixPath and make their parity assertions
  // vacuous. With the ceiling pinned open, maxBroadcastDocs alone
  // decides broadcast-vs-shuffle, so each case runs the plan its
  // comment claims.
  private def pairs(dir: String, maxVocab: Long,
      maxBroadcastDocs: Long = DedupOps.DenseVerifyMaxDocs): Seq[(Long, Long, Double)] = {
    val rows = DedupOps.ngramJaccardPairs(spark, dir, maxVocab, maxBroadcastDocs,
      broadcastCeiling = Long.MaxValue)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
      .toSeq
    Scratch.releaseAll()
    rows
  }

  test("probe overflow selects the broadcast-verify path naturally (crafted large-vocab corpus)") {
    // High-entropy texts push the 4-gram vocabulary past a tiny probe
    // bound, so the REGISTERED path-selection logic (probe overflow ->
    // doc-count gate -> broadcast verify) runs end-to-end rather than
    // being forced via maxVocab = 0. Mixed-case hex + doc-unique salts
    // give each doc distinct grams; the near-dup pair must survive.
    def text(seed: Long): String = (0 until 40).map { p =>
      val h = seed * 1000003L + p * 2654435761L
      java.lang.Long.toHexString(h & 0xffffffffffL)
    }.mkString(" ")
    val docs = (0L until 60L).map(i => (i, text(i))) :+
      (100L, text(7)) // exact duplicate of doc 7 -> jaccard 1.0
    val tmp = java.nio.file.Files.createTempDirectory("q53probe").toString
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val small = pairs(tmp, 64L) // probe overflows (vocab >> 64) -> broadcast path
    val bitset = pairs(tmp, 1000000L) // vocab fits -> bitset path
    assert(small.nonEmpty && small == bitset)
    assert(small.exists { case (a, b, j) => a == 7L && b == 100L && j == 1.0 })
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"q94 sketch pairs are a subset of q53 exact pairs on $sf") {
      // At sf scale the gram vocabulary is tiny, so 60-bit hash-set
      // Jaccard (q94's verify) equals string-set Jaccard (q53's)
      // exactly — every q94 pair must therefore appear in the exact
      // join's output; q94 may only MISS pairs (band S-curve + cap).
      val dir = s"/root/testdata/$sf"
      val exact = pairs(dir, 16384L).map(p => (p._1, p._2)).toSet
      val sketch = Registry.queriesMap("q94_ngram_minhash")(spark, dir)
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      Scratch.releaseAll()
      assert(sketch.nonEmpty, "q94 found no pairs; test is vacuous")
      assert(sketch.subsetOf(exact),
        s"q94 invented pairs the exact join rejects: ${(sketch -- exact).take(5)}")
    }

    test(s"all three physical paths agree on $sf") {
      val dir = s"/root/testdata/$sf"
      val bitset = pairs(dir, 16384L) // small vocab -> bitset plan
      val prefixBc = pairs(dir, 0L) // forced prefix + broadcast verify
      val prefixShuf = pairs(dir, 0L, 0L) // forced prefix + shuffle verify
      assert(bitset.nonEmpty, "corpus produced no near-dup pairs; test is vacuous")
      assert(prefixBc == bitset)
      assert(prefixShuf == bitset)
    }
  }
}
