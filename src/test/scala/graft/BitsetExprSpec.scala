package graft

import graft.plans.BitsetIntersectCount
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BitsetIntersectCount: interpreted eval vs whole-stage codegen
  * agreement, null handling, and popcount correctness.
  */
class BitsetExprSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(codegen: Boolean): Seq[(Long, Any)] = {
    import spark.implicits._
    BitsetIntersectCount.register(spark)
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      val df = Seq(
        (1L, Seq(0xFFL, 0x0FL), Seq(0x0FL, 0xF0L)),        // 4 + 0
        (2L, Seq(-1L, -1L), Seq(-1L, -1L)),                // 64 + 64
        (3L, Seq(0L), Seq(0L)),                            // 0
        (4L, Seq(1L, 2L, 4L), Seq(1L)))                    // width mismatch -> min width
        .toDF("id", "a", "b")
      df.select(col("id"), expr("bitset_intersect_count(a, b)").as("n"))
        .union(spark.sql(
          "SELECT 5L AS id, bitset_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.get(1))).toSeq
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("popcount intersect matches in interpreted and codegen modes, nulls propagate") {
    val expected = Seq[(Long, Any)]((1L, 4), (2L, 128), (3L, 0), (4L, 1), (5L, null))
    assert(run(codegen = true) == expected)
    assert(run(codegen = false) == expected)
  }

  test("type check rejects non-long arrays") {
    BitsetIntersectCount.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT bitset_intersect_count(array('x'), array('y'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("bitset_intersect_count"))
  }
}
