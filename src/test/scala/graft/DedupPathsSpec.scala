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

  private def pairs(dir: String, maxVocab: Long,
      maxBroadcastDocs: Long = DedupOps.DenseVerifyMaxDocs): Seq[(Long, Long, Double)] = {
    val rows = DedupOps.ngramJaccardPairs(spark, dir, maxVocab, maxBroadcastDocs)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
      .toSeq
    Scratch.releaseAll()
    rows
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
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
