package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q109's selection semantics on crafted geometry the sf embeddings
  * never isolate: the hardest negative must be the CLOSEST candidate
  * still under the margin (not an arbitrary one), candidates in the
  * dead zone [NegMax, PosMin) feed neither side, an anchor missing
  * either side emits nothing, and positive ties break on cand_id.
  * Buckets (sign bits at dims 1/17/33/49) isolate the scenarios. */
class PairMiningSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 64-dim unit-ish vector: tiny bucket-setting components at the
    * hyperplane dims (sign from `bucket0`), payload `c` on axis
    * `main` and sqrt(1-c²) on axis `rest` — so cos(v(c1,..), v(c2,..))
    * with the same `main` and different `rest` is c1·c2 + ~1e-6. */
  private def vec(bucket0Neg: Boolean, main: Int, c: Double, rest: Int): Seq[Float] = {
    val a = Array.fill(64)(0.0f)
    a(0) = if (bucket0Neg) -1e-3f else 1e-3f
    a(16) = 1e-3f; a(32) = 1e-3f; a(48) = 1e-3f
    a(main) = c.toFloat
    a(rest) = math.sqrt(1.0 - c * c).toFloat
    scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
  }

  test("crafted geometry: hardest negative, dead zone, tie-break, missing sides") {
    // Bucket A (1111): anchor 0 = pure axis-1. Candidates on axis 1:
    //   id 1: cos ~0.9 (positive, the pick)   id 2: cos ~0.30 (positive, outranked)
    //   id 3: cos ~0.15 (dead zone)           id 4: cos ~0.09 (hardest negative)
    //   id 5: cos ~0.05 (easier negative, must NOT be picked)
    val bucketA = Seq(
      (0L, vec(false, 1, 1.0, 2)),
      (1L, vec(false, 1, 0.9, 3)),
      (2L, vec(false, 1, 0.30, 4)),
      (3L, vec(false, 1, 0.15, 5)),
      (4L, vec(false, 1, 0.09, 6)),
      (5L, vec(false, 1, 0.05, 7)))
    // Bucket B (0111): anchor 10. Two positives at the SAME cosine
    // (identical payload, different orthogonal rest axis) -> tie must
    // break to the smaller id 11. One negative so the anchor emits.
    val bucketB = Seq(
      (10L, vec(true, 1, 1.0, 2)),
      (12L, vec(true, 1, 0.5, 4)),
      (11L, vec(true, 1, 0.5, 3)),
      (13L, vec(true, 1, 0.02, 5)))
    // Bucket C (1111 is taken; use anchor 20 in its own bucket via a
    // negative dim-16 component): only negatives -> no output row.
    val bucketC = Seq(
      (20L, {
        val a = vec(false, 1, 1.0, 2).toArray; a(16) = -1e-3f
        scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
      }),
      (21L, {
        val a = vec(false, 1, 0.01, 3).toArray; a(16) = -1e-3f
        scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
      }))
    val tmp = java.nio.file.Files.createTempDirectory("q109spec").toString
    spark.createDataFrame(bucketA ++ bucketB ++ bucketC)
      .toDF("vec_id", "embedding")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val got = Registry.queriesMap("q109_pair_mining")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))

    assert(got.map(_._1).toSeq == Seq(0L, 10L),
      s"anchor 20 (no positive) must emit nothing; got ${got.toSeq}")
    val a0 = got.find(_._1 == 0L).get
    assert(a0._2 == 1L && a0._4 == 4L,
      s"anchor 0: positive must be id 1 (cos .9) and hardest negative id 4 (cos .09), got $a0")
    assert(math.abs(a0._3 - 0.9) < 0.01 && math.abs(a0._5 - 0.09) < 0.01)
    val a10 = got.find(_._1 == 10L).get
    assert(a10._2 == 11L,
      s"anchor 10: positive tie at cos .5 must break to the smaller id 11, got $a10")
    assert(a10._4 == 13L && math.abs(a10._3 - 0.5) < 0.01)
  }
}
