package graft

import graft.functions.Similarity
import graft.plans.SeqRatio
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SeqRatio expression: interpreted eval vs whole-stage codegen
  * agreement, null handling, and bit-exact parity with the Scala
  * kernel the typed dedupe path uses — the native pair decision is
  * only sound if both evaluations produce identical doubles.
  */
class SeqRatioExprSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val cases = Seq(
    ("james", "jim"), ("Robert", "robert"), ("elizabeth", "elisabeth"),
    ("patricia", "patrick"), ("", "x"), ("", ""), ("josé", "jose"),
    ("thomas", "tomas"), ("a", "a"), ("susan", "sarah"))

  private def run(codegen: Boolean): Seq[(Long, Any)] = {
    import spark.implicits._
    SeqRatio.register(spark)
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      cases.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "a", "b")
        .select(col("id"), expr("seq_ratio(a, b)").as("r"))
        .union(spark.sql("SELECT 100L AS id, seq_ratio(CAST(NULL AS STRING), 'x') AS r"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.get(1))).toSeq
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("expression matches the Scala kernel bit-exactly in both modes; null propagates") {
    val expected = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, Similarity.seqRatio(a, b): Any) } :+
      ((100L, null: Any))
    assert(run(codegen = true) == expected)
    assert(run(codegen = false) == expected)
  }

  test("type check rejects non-string arguments") {
    SeqRatio.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT seq_ratio(array(1), array(2))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("seq_ratio"))
  }
}
