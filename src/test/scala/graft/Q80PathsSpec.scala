package graft

import graft.queries.CurationOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan parity for q80's guarded boilerplate set: the
  * semi-join fallback (the plan a pathological every-shingle-boiler
  * corpus selects, where broadcasting would OOM the driver) must
  * compute exactly what the broadcast-set path computes. The driver
  * corpora contain no shingle at df ≥ N/5, so a synthetic corpus with
  * real boilerplate (a shared header across 40 % of docs) exercises
  * the non-trivial counts; the sf corpora still pin all-zero parity.
  */
class Q80PathsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(dir: String, cap: Long): Seq[(Long, Long, Long, Double)] = {
    val out = CurationOps.boilerplateDf(spark, dir, cap)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_boiler"), r.getAs[Double]("boiler_frac")))
      .toSeq
    Scratch.releaseAll()
    out
  }

  private lazy val synthDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q80corpus").toString
    val header = "subscribe to our newsletter today"
    val docs = (0L until 50L).map { i =>
      val body = s"a$i b$i c$i d$i e$i f$i g$i" // per-doc-unique shingles only
      val text = if (i % 5 < 2) s"$header $body" else body
      (i, text)
    }
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("semi-join path = broadcast path on a corpus with real boilerplate") {
    val broadcast = rows(synthDir, 4000000L) // under the cap -> broadcast plan
    val joined = rows(synthDir, 0L) // forced semi-join fallback
    assert(broadcast.exists(_._3 > 0),
      "synthetic corpus produced no boilerplate shingles; test is vacuous")
    assert(broadcast.exists(r => r._3 == 0 && r._2 > 0),
      "synthetic corpus has no boiler-free doc; fallback's left join untested")
    assert(joined == broadcast)
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"semi-join path = broadcast path on $sf") {
      val dir = s"/root/testdata/$sf"
      assert(rows(dir, 0L) == rows(dir, 4000000L))
    }
  }
}
