package graft

import graft.queries.DedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Verify-set parity for q51's adaptive plan (round 9): the registered
  * plan defers the exact-verify hash sets to a candidate-restricted
  * second pass when the probe finds few candidate docs, and falls back
  * to the one-pass full-hs verify when dense. Both branches — and the
  * pre-round-9 one-pass reference plan — must compute identical
  * verified pair sets; the test corpora are sparse, so without forcing
  * the dense branch here it would ship untested (the DedupPathsSpec
  * lesson).
  */
class Q51AdaptiveSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] = {
    val rows = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
      .toSeq.sorted
    Scratch.releaseAll()
    rows
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"deferred, dense-fallback, and one-pass verify plans agree on $sf") {
      val dir = s"/root/testdata/$sf"
      val onePass = collectPairs(DedupOps.minhashPairsOnePass(spark, dir))
      // Huge cap -> probe always chooses the deferred broadcast branch.
      val deferred = collectPairs(
        DedupOps.minhashPairsAdaptive(spark, dir, Long.MaxValue))
      // Cap 0 -> probe always chooses the dense full-hs fallback.
      val dense = collectPairs(DedupOps.minhashPairsAdaptive(spark, dir, 0L))
      assert(onePass.nonEmpty, "corpus produced no verified pairs; test is vacuous")
      assert(deferred == onePass)
      assert(dense == onePass)
    }
  }
}
