package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B profile of q50's normalization stage at volume: is the 2M-doc
  * cost the regexp_replace kernel or the file-split parallelism?
  * Variants: (1) shipped regex at scan parallelism, (2) regex behind a
  * repartition(32) (full text shuffle), (3) JIT char-filter kernel at
  * scan parallelism.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.ProfQ50 /tmp/dedup2m"
  */
object ProfQ50 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/dedup2m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val alnumLower = udf { (s: String) =>
      if (s == null) null
      else {
        val n = s.length
        val b = new java.lang.StringBuilder(n)
        var i = 0
        while (i < n) {
          val c = s.charAt(i)
          if ((c >= '0' && c <= '9') || (c >= 'a' && c <= 'z')) b.append(c)
          else if (c >= 'A' && c <= 'Z') b.append((c + 32).toChar)
          i += 1
        }
        b.toString
      }
    }

    def time(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.groupBy(col("source"))
        .agg(countDistinct(col("fp")).as("u")).queryExecution.toRdd.count()
      println(f"PROFQ50 $tag%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    for (rep <- 1 to 2) {
      time("regex_scanpar", docs.select(col("source"),
        md5(lower(regexp_replace(col("text"), "[^a-zA-Z0-9]", ""))).as("fp")))
      time("regex_repart32", docs.repartition(spark.sparkContext.defaultParallelism)
        .select(col("source"),
          md5(lower(regexp_replace(col("text"), "[^a-zA-Z0-9]", ""))).as("fp")))
      time("jit_scanpar", docs.select(col("source"),
        md5(alnumLower(col("text"))).as("fp")))
      println(s"PROFQ50 --- rep $rep done ---")
    }
    spark.stop()
  }
}
