package graft

import org.apache.spark.sql.SparkSession
import graft.etl._

/** Isolates the q40 first-touch cost: is the ~6 s normalize+checkpoint
  * at sf0.1 per-plan-instance driver work (analysis/codegen) or JVM
  * warmup? Mirrors the bench: warm pass at sf0.001, then repeated
  * fresh-plan materializations at sf0.1.
  */
object Prof6 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    t("warm.sf0001")(Pipeline.normalize(Synth.contacts(spark, "/root/testdata/sf0.001"))
      .localCheckpoint(true).count())
    val dir = "/root/testdata/sf0.1"
    t("norm1.sf01")(Pipeline.normalize(Synth.contacts(spark, dir)).localCheckpoint(true).count())
    t("norm2.sf01")(Pipeline.normalize(Synth.contacts(spark, dir)).localCheckpoint(true).count())
    val n = t("norm3.keep")(Pipeline.normalize(Synth.contacts(spark, dir)).localCheckpoint(true))
    import spark.implicits._
    t("q40.body")(n.map(c => (c.row_id, c.prefix, c.first_name, c.last_name, c.suffix, c.full_name))
      .toDF("custkey", "prefix", "first_name", "last_name", "suffix", "full_name")
      .orderBy("custkey").count())
    spark.stop()
  }
}
