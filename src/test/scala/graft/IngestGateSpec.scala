package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q96 (batch band join) and q98 (stream-static probe with per-row
  * signatures) declare the SAME output relation under one shared
  * oracle — this spec pins the two physical engines to each other
  * directly, including at sf0.001 where the index-bucket cap's drop
  * path actually fires (4 over-cap buckets; sf0.01's max bucket is
  * exactly the cap, so only the oracle gate covers it there). The
  * stream side's per-row `transform` minhash fold must be
  * hash-identical to the batch aggregation — any drift in the
  * shared parameters breaks this, not just the oracle. */
class IngestGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"q98's streamed relation equals q96's batch relation on $sf") {
      val dir = s"/root/testdata/$sf"
      def rows(name: String): Seq[(Long, Long, Long, Double)] = {
        val r = Registry.queriesMap(name)(spark, dir).collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_matches"),
            r.getAs[Long]("best_match"), r.getAs[Double]("best_jaccard")))
          .toSeq
        Scratch.releaseAll()
        r
      }
      val batch = rows("q96_incremental_dedup")
      val streamed = rows("q98_stream_ingest_gate")
      assert(batch.nonEmpty, "no ingest matches on this corpus; test is vacuous")
      assert(streamed == batch)
    }
  }
}
