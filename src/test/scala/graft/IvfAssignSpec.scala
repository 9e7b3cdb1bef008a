package graft

import graft.queries.SimilarityOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q79/q85 assignment rewrite (groupBy argmax via
  * max(struct(aff, -cell)), vector riding through as first()) must be
  * EXACTLY the row_number-window rank-1 it replaced — including the
  * tie-break to the lowest cell — on arbitrary data, not just the
  * oracle corpus. Random vectors with duplicated affinity ties
  * exercise the tie path deliberately (quantized coordinates make
  * equal-affinity cells common). */
class IvfAssignSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic pseudo-random corpus: dim-8 vectors with COARSELY
    * quantized coordinates from an integer hash, so distinct cells
    * often tie on rounded affinity. */
  private def corpus(n: Int, cells: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    def vec(seed: Long): Seq[Float] =
      (0 until 8).map(p => (((seed * 2654435761L + p * 40503L) % 5) - 2).toFloat)
    val e = (0 until n).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "v")
      .where(graft.plans.VecDotProduct(col("v"), col("v")) > 0)
      .withColumn("norm", sqrt(graft.plans.VecDotProduct(col("v"), col("v"))))
    val trained = (0 until cells).map(i => (i.toLong, vec(1000L + i)))
      .toDF("cell", "cv")
      .where(graft.plans.VecDotProduct(col("cv"), col("cv")) > 0)
      .select(col("cell"), col("cv").cast("array<double>").as("cv"))
      .withColumn("cn", sqrt(graft.plans.VecDotProduct(col("cv"), col("cv"))))
    (e, trained)
  }

  private def windowReference(e: DataFrame, trained: DataFrame): Set[(Long, Long, Double)] = {
    val aw = Window.partitionBy(col("vec_id"))
      .orderBy(col("aff").desc, col("cell").asc)
    SimilarityOps.affinityTo(e, trained)
      .withColumn("crank", row_number().over(aw))
      .where(col("crank") === 1)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Double]("aff")))
      .toSet
  }

  test("groupBy argmax assignment = window rank-1, ties to lowest cell") {
    val (e, trained) = corpus(500, 16)
    val expected = windowReference(e, trained)
    val viaArgmax = SimilarityOps.assignedCells(e, trained)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Double]("aff")))
      .toSet
    assert(viaArgmax == expected)
    // Tie coverage: the quantized corpus must actually produce ties,
    // or the tie-break assertion is vacuous.
    val ties = SimilarityOps.affinityTo(e, trained)
      .groupBy(col("vec_id"), col("aff")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).count()
    assert(ties > 0, "no affinity ties in corpus; tie-break untested")
  }

  test("assignedWithVec carries the member vector and matches assignedCells") {
    val (e, trained) = corpus(300, 8)
    val slim = SimilarityOps.assignedCells(e, trained)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).toSet
    val withVec = SimilarityOps.assignedWithVec(e, trained)
    val wv = withVec.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).toSet
    assert(wv == slim)
    // the riding vector is the member's own embedding
    val eMap = e.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](r.fieldIndex("v")).toList).toMap
    withVec.collect().foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("v")).toList ==
        eMap(r.getAs[Long]("vec_id")))
    }
  }
}
