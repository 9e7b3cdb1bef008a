package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q106's sketch-equals-exact contract: the Misra-Gries candidate
  * union must be a SUPERSET of the true heavy hitters under any
  * partitioning (the pigeonhole argument in mgCandidates' scaladoc),
  * and the exact trim must make the end-to-end output identical to
  * the full groupBy — which is what the registered oracle re-proves
  * cross-engine. This spec drives the sketch through eviction
  * pressure and partitioning changes the sf corpora don't exercise. */
class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ds(xs: Seq[String], parts: Int): Dataset[String] = {
    val s = spark
    import s.implicits._
    s.createDataset(xs).repartition(parts)
  }

  private def exactHeavy(xs: Seq[String], cap: Int): Map[String, Long] = {
    val n = xs.size.toLong
    xs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (cap + 1) > n }.toMap
  }

  private def collected(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("partitioning invariance: same exact output at 1, 3, and 16 partitions") {
    val rnd = new scala.util.Random(7L)
    val xs = rnd.shuffle(
      Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
        (0 until 600).map(i => s"filler_$i"))
    // N = 1220, cap 9 -> threshold n*10 > 1220: hot (500) passes,
    // warm (120) misses by one decade, fillers never.
    val expected = exactHeavy(xs, 9)
    assert(expected == Map("hot" -> 500L))
    for (parts <- Seq(1, 3, 16))
      assert(collected(queries.CurationOps.heavyFromShingles(ds(xs, parts), 9))
        == expected, s"output must not depend on partitioning ($parts parts)")
  }

  test("superset guarantee + eviction pressure on a skewed random stream") {
    val rnd = new scala.util.Random(20260815L)
    // ~8k rows over ~2k distinct keys with a heavy head.
    val xs = Seq.fill(8000) {
      val r = rnd.nextInt(100)
      if (r < 30) s"head_${rnd.nextInt(5)}" else s"tail_${rnd.nextInt(2000)}"
    }
    val cap = 20
    val parts = 4
    val (cands, n) = queries.CurationOps.mgCandidates(ds(xs, parts), cap)
    assert(n == xs.size.toLong, "sentinel totals must sum to the stream size")
    assert(cands.length <= cap * parts, "summary size is bounded by cap per partition")
    assert(cands.length < xs.distinct.size,
      "eviction must have fired (summaries are sketches, not exact maps)")
    val expected = exactHeavy(xs, cap)
    assert(expected.nonEmpty, "the crafted stream must have heavy hitters")
    assert(expected.keySet.subsetOf(cands.toSet),
      "candidates must be a superset of the true heavy hitters")
    assert(collected(queries.CurationOps.heavyFromShingles(ds(xs, parts), cap))
      == expected, "exact trim must equal the full groupBy")
  }

  test("registered instance at sf0.001 equals the full shingle groupBy") {
    val s = spark
    import s.implicits._
    val shingles = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(split(trim(col("text")), " +").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(explode(queries.shingleStringsUdf(3)(col("toks"))).as("s"))
      .as[String]
    val n = shingles.count()
    val exact = shingles.toDF("shingle").groupBy(col("shingle"))
      .agg(count(lit(1)).as("n")).where(col("n") * 4096 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    assert(collected(queries.CurationOps.heavyFromShingles(shingles, 4095)) == exact)
  }
}
