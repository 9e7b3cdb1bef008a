package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeRemove {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val b = Scratch.scoped(queries.DedupOps.bandedFor(spark, dir, lit(true)))
      for (pct <- Seq(10, 3)) {
        val rem = queries.h60(concat(lit("remove:"), col("doc_id"))) % pct === 0
        val agg = b.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("n"),
            sum(when(rem, 1).otherwise(0)).as("nrem"))
        val dist = agg.groupBy(col("n")).agg(count(lit(1)).as("buckets"),
            sum(when(col("nrem") > 0, 1).otherwise(0)).as("touched"))
          .orderBy(col("n")).collect()
        println(s"== $sf pct=1/$pct sizes: " + dist.map(r => s"n=${r.getLong(0)}:${r.getLong(1)}(touched ${r.getLong(2)})").mkString(" "))
        for (cap <- Seq(2, 3)) {
          val demote = agg.where(col("n") > cap && (col("n") - col("nrem")) <= cap && (col("n") - col("nrem")) > 0).count()
          val persist = agg.where(col("n") > cap && (col("n") - col("nrem")) > cap).count()
          val dropAll = agg.where(col("nrem") === col("n")).count()
          println(s"   cap=$cap demote=$demote persist=$persist dropAll=$dropAll")
        }
      }
      Scratch.releaseAll()
    }
    spark.stop()
  }
}

/** [[ProbeRemove]] for the EMBEDDING banding (q123's instance). */
object ProbeRemoveEmb {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val b = Scratch.scoped(queries.DedupOps.embBandedFor(spark, dir, lit(true)))
      for (pct <- Seq(10, 3)) {
        val rem = queries.h60(concat(lit("remove:"), col("doc_id"))) % pct === 0
        val agg = b.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("n"), sum(when(rem, 1).otherwise(0)).as("nrem"))
        for (cap <- Seq(12, 56)) {
          val demote = agg.where(col("n") > cap && (col("n") - col("nrem")) <= cap && (col("n") - col("nrem")) > 0).count()
          val persist = agg.where(col("n") > cap && (col("n") - col("nrem")) > cap).count()
          val dropAll = agg.where(col("nrem") === col("n")).count()
          println(s"== $sf pct=1/$pct cap=$cap demote=$demote persist=$persist dropAll=$dropAll")
        }
      }
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
