package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The quality-aware survivor policy must actually CHANGE a canonical
  * somewhere: on the sf corpora every cluster's members tie on the
  * gate score, so q100 degenerates to q73's min-id there (verified —
  * 23/23 identical canonicals at sf0.01) and the policy would ship
  * unexercised without this crafted corpus: a near-dup pair whose
  * MIN-ID member fails the stopword rule (its two stop tokens
  * replaced by junk), so q73 keeps doc 0 while q100 must keep the
  * higher-quality doc 1.
  */
class Q100PolicySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q100 keeps the higher-quality member where q73 keeps min-id") {
    // 100 tokens, ~5-char alpha-ish words, stop words at positions
    // 10/11 ('the and') in the GOOD doc; the BAD doc (lower id!)
    // replaces exactly those two tokens -> 0 stop hits, all other
    // gate rules still pass, shingle Jaccard ~0.9 (>= the 0.8 verify
    // threshold and high enough for the 4x3 bands to collide).
    val words = (0 until 100).map(i => f"tok$i%02d")
    val good = words.updated(10, "the").updated(11, "and").mkString(" ")
    val bad = words.updated(10, "zzq").updated(11, "qzz").mkString(" ")
    val docs = Seq((0L, bad), (1L, good), (7L, (200 until 300).map(i => s"oth$i").mkString(" ")))
    val tmp = java.nio.file.Files.createTempDirectory("q100policy").toString
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val q73 = Registry.queriesMap("q73_neardup_clusters")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("canonical_id"), r.getAs[String]("members")))
    val q100 = Registry.queriesMap("q100_quality_canonical")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("best_q"),
        r.getAs[String]("members")))
    Scratch.releaseAll()

    assert(q73.toSeq == Seq((0L, "0,1")), s"q73 unexpected: ${q73.toSeq}")
    assert(q100.toSeq == Seq((1L, 4L, "0,1")),
      s"q100 must pick the quality winner: ${q100.toSeq}")
  }
}
