package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q111 on a crafted 3-source corpus with hand-countable overlap:
  * the matrix must count DISTINCT shared shingles (a shingle repeated
  * in many docs of a source still counts once), pairs with zero
  * overlap must be absent, and the Jaccard denominators must be the
  * per-source distinct shingle counts. */
class SourceOverlapSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("crafted 3-source corpus: distinct shared counts, absent zero pairs, Jaccard") {
    // 8-token lines -> each doc contributes exactly len-7 shingles.
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 toks, 1 shingle
    val aOnly = "a1 a2 a3 a4 a5 a6 a7 a8"
    val bOnly = "b1 b2 b3 b4 b5 b6 b7 b8"
    val cOnly = "c1 c2 c3 c4 c5 c6 c7 c8"
    val rows = Seq(
      // source A: the shared line twice (distinct must collapse) + own line
      (0L, shared, "en", "A", 0L),
      (1L, shared, "en", "A", 0L),
      (2L, aOnly, "en", "A", 0L),
      // source B: shared line + own line
      (3L, shared, "en", "B", 0L),
      (4L, bOnly, "en", "B", 0L),
      // source C: no overlap with anyone
      (5L, cOnly, "en", "C", 0L))
    val tmp = java.nio.file.Files.createTempDirectory("q111spec").toString
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Registry.queriesMap("q111_source_overlap")(spark, tmp)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // Only (A, B) overlaps: 1 shared shingle; A has 2 distinct, B has 2.
    assert(got.keySet == Set(("A", "B")),
      s"zero-overlap pairs must be absent, got ${got.keySet}")
    assert(got(("A", "B")) == ((1L, 2L, 2L, 0.333333)),
      s"got ${got(("A", "B"))}")
  }
}
