package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q110's centroid arithmetic on crafted geometry with hand-computable
  * answers, plus the partitioning-invariance property the decimal rule
  * buys: per-dimension sums are exact, so the drift matrix is
  * bit-identical no matter how rows land in partitions (a plain
  * float/double sum would drift in the last ulp with partitioning and
  * could flip the 4-dp rounding). */
class CentroidSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def vec(parts: (Int, Float)*): Seq[Float] = {
    val a = Array.fill(64)(0.0f)
    parts.foreach { case (i, v) => a(i) = v }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
  }

  test("crafted geometry: centroids and drift cosines match hand computation") {
    // Label 0: (1,0,..) and (0,1,..) -> centroid (.5,.5,0..), norm .5*sqrt(2).
    // Label 1: two copies of (1,0,..) -> centroid (1,0,..).
    //   cos(c0, c1) = .5 / (.5*sqrt(2) * 1) = 1/sqrt(2) = 0.7071.
    // Label 2: (0,0,1,..) -> orthogonal to both: cos = 0.
    val rows = Seq(
      (0L, vec(0 -> 1.0f), 0),
      (1L, vec(1 -> 1.0f), 0),
      (2L, vec(0 -> 1.0f), 1),
      (3L, vec(0 -> 1.0f), 1),
      (4L, vec(2 -> 1.0f), 2))
    val tmp = java.nio.file.Files.createTempDirectory("q110spec").toString
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Registry.queriesMap("q110_embedding_centroids")(spark, tmp)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set((0, 1), (0, 2), (1, 2)))
    assert(got((0, 1)) == ((2L, 2L, 0.7071)), s"got ${got((0, 1))}")
    assert(got((0, 2)) == ((2L, 1L, 0.0)))
    assert(got((1, 2)) == ((2L, 1L, 0.0)))
  }

  test("partitioning invariance: identical matrix at 1, 3, and 16 partitions") {
    val rnd = new scala.util.Random(11L)
    val rows = (0L until 300L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1), (i % 4).toInt))
    val base = spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    val results = Seq(1, 3, 16).map { p =>
      val tmp = java.nio.file.Files.createTempDirectory(s"q110p$p").toString
      base.repartition(p)
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      Registry.queriesMap("q110_embedding_centroids")(spark, tmp)
        .collect().map(_.toSeq).toSeq
    }
    assert(results(0) == results(1) && results(1) == results(2),
      "drift matrix must be exactly partition-invariant (decimal sums)")
  }
}
