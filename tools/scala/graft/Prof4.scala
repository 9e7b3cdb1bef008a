package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl._

/** Volume profile of the acceptedPairs internals: slim rows, clique
  * chains, accepted edges — plus wall time per stage. (The candidate
  * join/evidence internals are private to Pipeline; this measures the
  * operator's observable volumes and cost at the target SF.) */
object Prof4 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val raw = Synth.contacts(spark, dir)
    val norm = t("norm.checkpoint")(Pipeline.normalize(raw).localCheckpoint(true))
    val slim = t("slim.checkpoint")(
      norm.map(ContactLogic.toMatchRec).localCheckpoint(true))
    println(s"rows=${slim.count()}")
    println(s"blocks=${slim.select(col("block")).distinct().count()}")
    val edges = Pipeline.acceptedPairs(norm)
    t("accepted.edges") { println(s"edges=${edges.count()}") }
    val edges2 = Pipeline.acceptedPairs(norm,
      ContactLogic.DedupeConfig(matchKeyFrequencyCap = Some(50L)))
    t("accepted.capped") { println(s"edges=${edges2.count()}") }
    Scratch.releaseAll()
    spark.stop()
  }
}
