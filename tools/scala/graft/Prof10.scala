package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl._

/** Physical-plan audit of the acceptedPairs edge stage: prints the
  * formatted plan so broadcast-exchange reuse (or its absence) across
  * the two side-info joins is directly visible. */
object Prof10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val raw = Synth.contacts(spark, dir)
    val norm = Pipeline.normalize(raw).localCheckpoint(true)
    val edges = Pipeline.acceptedPairs(norm)
    val plan = edges.queryExecution.executedPlan.toString
    val bx = plan.linesIterator.count(l => l.contains("BroadcastExchange"))
    val rbx = plan.linesIterator.count(l => l.contains("ReusedExchange"))
    println(s"PROF10 broadcastExchanges=$bx reused=$rbx")
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") ||
      l.contains("LogicalRDD") || l.contains("Window") || l.contains("Scan ExistingRDD"))
      .foreach(l => println("PROF10P " + l.take(150)))
    Scratch.releaseAll()
    spark.stop()
  }
}
