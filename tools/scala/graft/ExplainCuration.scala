package graft
import org.apache.spark.sql.SparkSession
object ExplainCuration {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- queries.CurationOps.all) {
      println(s"===== ${q.name} =====")
      q.run(spark, "/root/testdata/sf0.001").explain("formatted")
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
