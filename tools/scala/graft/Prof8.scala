package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: print formatted plans for named queries. */
object Prof8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (q <- Registry.all if args.drop(1).contains(q.name)) {
      println(s"===== ${q.name}")
      q.run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
