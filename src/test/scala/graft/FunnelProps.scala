package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the funnel pair: on RANDOM event streams (ties,
  * duplicates, missing steps, interleaved users) both the q113 batch
  * cascade and the q115 streaming walk must equal a direct driver
  * reference implementation of the definition — t1 = min view,
  * t2 = min click > t1, t3 = min purchase > t2. Randomness covers
  * the shapes the crafted specs enumerate by hand. */
class FunnelProps extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def reference(evs: Seq[(Long, Long, String)]): Map[Long, (Int, Option[Long], Option[Long])] =
    evs.groupBy(_._1).flatMap { case (uid, es) =>
      val t1 = es.collect { case (_, ts, "view") => ts }.minOption
      t1.map { v =>
        val t2 = es.collect { case (_, ts, "click") if ts > v => ts }.minOption
        val t3 = t2.flatMap(c =>
          es.collect { case (_, ts, "purchase") if ts > c => ts }.minOption)
        uid -> ((if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1,
          t2.map(_ - v), t3.flatMap(p => t2.map(p - _))))
      }
    }

  test("random streams: q113 and q115 both equal the driver reference") {
    val rnd = new scala.util.Random(20260815L)
    val types = Vector("view", "click", "purchase", "signup", "error")
    for (round <- 0 until 3) {
      // ~40 users, ~300 events, coarse timestamps (seconds) so ties
      // between types at the same instant actually occur.
      val evs = (0 until 300).map { i =>
        (rnd.nextInt(40).toLong, (1700000000L + rnd.nextInt(50)) * 1000000L,
          types(rnd.nextInt(types.size)))
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"funprops$round").toString
      spark.createDataFrame(evs.zipWithIndex.map { case ((u, us, ty), i) =>
        (i.toLong, new java.sql.Timestamp(us / 1000L), u, ty, 0.0, "{}")
      }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(4)
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")

      val expect = reference(evs.map { case (u, us, ty) => (u, us, ty) })
      for (q <- Seq("q113_funnel", "q115_stream_funnel")) {
        val got = Registry.queriesMap(q)(spark, tmp)
          .collect().map(r => r.getLong(0) -> ((r.getInt(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
        assert(got == expect, s"$q deviates from the reference (round $round)")
      }
    }
  }
}
