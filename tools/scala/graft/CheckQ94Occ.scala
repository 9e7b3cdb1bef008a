package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CheckQ94Occ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val occ = queries.DedupOps.q94Banded(spark, s"/root/testdata/$sf")
        .groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
      val row = occ.agg(max(col("n")).as("mx"),
        sum(when(col("n") > queries.DedupOps.Q94Cap, 1).otherwise(0)).as("over")).collect()(0)
      Scratch.releaseAll()
      println(s"CHECKQ94 $sf maxBucket=${row.get(0)} overCapBuckets=${row.get(1)} cap=${queries.DedupOps.Q94Cap}")
    }
    spark.stop()
  }
}
