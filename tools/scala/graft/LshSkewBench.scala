package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The LSH skew case the band-bucket cap (q88) exists for: the tape
  * corpus (tools/curation_gen.py) draws every document as a window
  * over one of 16 token tapes, so thousands of documents share most
  * of their shingles with thousands of others — moderate pairwise
  * Jaccard everywhere, which the 4x3 band S-curve turns into huge
  * band buckets. Uncapped LSH candidate volume is Σ b·(b-1)/2 over
  * bucket sizes b: this tool measures that sum (the work the
  * self-join WOULD do), then runs the capped operator end-to-end.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.LshSkewBench /tmp/curation2m 64"
  */
object LshSkewBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/curation2m")
    val cap = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Bucket-size census: what the uncapped band self-join would face.
    val t0 = System.nanoTime()
    val (_, banded) = queries.DedupOps.sigBanded(spark, dir)
    val row = banded.groupBy(col("band"), col("key")).count()
      .agg(
        count(lit(1)).as("buckets"),
        max(col("count")).as("max_bucket"),
        sum(col("count") * (col("count") - 1) / 2).as("cand_uncapped"),
        sum(when(col("count") > cap, col("count") * (col("count") - 1) / 2)
          .otherwise(0L)).as("cand_from_hot"),
        sum(when(col("count") > cap, 1L).otherwise(0L)).as("hot_buckets"))
      .collect()(0)
    val censusSec = (System.nanoTime() - t0) / 1e9
    Scratch.releaseAll()
    println(f"LSHSKEW census ${censusSec}%.1f s: buckets=${row.getAs[Long]("buckets")}%,d " +
      f"max_bucket=${row.getAs[Long]("max_bucket")}%,d " +
      f"cand_uncapped=${row.getAs[Double]("cand_uncapped")}%,.0f " +
      f"cand_from_hot=${row.getAs[Double]("cand_from_hot")}%,.0f " +
      f"hot_buckets(>${cap})=${row.getAs[Long]("hot_buckets")}%,d")

    // Capped run, end to end (signature stage + bounded buckets +
    // verify), full output materialization.
    val t1 = System.nanoTime()
    val pairs = queries.DedupOps.minhashPairsCapped(spark, dir, cap)
      .queryExecution.toRdd.count()
    val cappedSec = (System.nanoTime() - t1) / 1e9
    Scratch.releaseAll()
    println(f"LSHSKEW capped($cap) ${cappedSec}%.1f s  verified_pairs=$pairs%,d")
    spark.stop()
  }
}
