package graft

import graft.plans.VecDotProduct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VecDotProduct over every element-type pairing (float×float,
  * double×double, and mixed): interpreted eval vs whole-stage codegen
  * agreement, bit-exact parity with the sequential double fold the
  * oracle computes, and null/type-check behavior. The mixed pairings
  * are what the trained-IVF query (q79) relies on — float corpus
  * vectors scored against double centroid means.
  */
class VecDotProductSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val xs = Seq(1.5f, -2.25f, 0.125f, 3.75f)
  private val ys = Seq(0.5f, 4.0f, -1.25f, 2.5f)

  /** The reference fold: element i widened to double, multiplied,
    * accumulated left-to-right. */
  private def fold(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  private def run(codegen: Boolean): Seq[(String, Any)] = {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      val df = Seq((xs, ys)).toDF("xf", "yf")
        .select(col("xf"), col("yf"),
          col("xf").cast("array<double>").as("xd"),
          col("yf").cast("array<double>").as("yd"))
      df.select(
          VecDotProduct(col("xf"), col("yf")).as("ff"),
          VecDotProduct(col("xd"), col("yd")).as("dd"),
          VecDotProduct(col("xf"), col("yd")).as("fd"),
          VecDotProduct(col("xd"), col("yf")).as("df"),
          VecDotProduct(lit(null).cast("array<float>"), col("yf")).as("nul"))
        .collect().flatMap(r => Seq(
          ("ff", r.get(0)), ("dd", r.get(1)), ("fd", r.get(2)),
          ("df", r.get(3)), ("nul", r.get(4)))).toSeq
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("all element-type pairings match the sequential fold in both modes") {
    val d = fold(xs.map(_.toDouble), ys.map(_.toDouble))
    val expected = Seq(
      ("ff", d: Any), ("dd", d: Any), ("fd", d: Any), ("df", d: Any),
      ("nul", null: Any))
    assert(run(codegen = true) == expected)
    assert(run(codegen = false) == expected)
  }

  test("type check rejects non-numeric-array arguments") {
    val e = intercept[Exception] {
      spark.range(1)
        .select(VecDotProduct(array(lit("a")), array(lit("b"))))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("vec_dot"))
  }
}
