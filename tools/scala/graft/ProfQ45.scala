package graft

import graft.etl.{ContactLogic, Pipeline, Synth}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the q45 dataflow: normalize, accepted pairs,
  * connected components, cluster merge + projection — each forced
  * separately so the wall splits by phase instead of lumping into the
  * final action. Reps > 1 show the warm (bench-relevant) cost.
  *
  * Optional third arg is a stop-key frequency cap: `... sf0.1 2 50`
  * profiles the q72 dataflow (q45 + the cap) with the same phase
  * split, so the two queries' floors are directly comparable. */
object ProfQ45 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cap = args.lift(2).map(_.toLong)
    val tag = if (cap.isDefined) "PROFQ72" else "PROFQ45"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (i <- 1 to reps) {
      println(s"---- rep $i")
      val norm = t("normalize+checkpoint") {
        Pipeline.normalize(Synth.contacts(spark, dir)
          .repartition(spark.sparkContext.defaultParallelism)).localCheckpoint(true)
      }
      val edges = t("acceptedPairs+count") {
        val e = Pipeline.acceptedPairs(norm,
          ContactLogic.DedupeConfig(matchKeyFrequencyCap = cap))
        e.count(); e
      }
      val comps = t("connectedComponents") {
        val c = Pipeline.connectedComponents(
          norm.select(col("row_id").as[java.lang.Long]), edges)
        c.count(); c
      }
      t("merge+project+count") {
        val merged = norm
          .joinWith(comps.as[(Long, Long)], norm("row_id") === comps("id"))
          .map(p => (p._1, p._2._2)).groupByKey(_._2)
          .mapGroups { (_, it) =>
            ContactLogic.mergeCluster(
              it.map(_._1).toSeq.sortBy(_.row_id).map(c => (c, c)))._1
          }
        merged.map(m => (m.contact.full_name, m.source_row_count))
          .toDF("n", "c").count()
      }
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
