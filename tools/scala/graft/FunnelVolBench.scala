package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Volume run for q113's funnel at 24M events / 200k users
  * (`events_gen` corpus — the same one the streaming family's volume
  * rows replay). Verification is an INDEPENDENT dataflow: a
  * groupByKey(user).mapGroups pass that buffers each user's (ts,
  * type) pairs and walks the funnel imperatively — one shuffle, no
  * joins, a completely different plan shape from the registered
  * three-stage conditional-min cascade — asserted equal row-for-row
  * (the strictly-after rule is easy to get wrong in exactly one of
  * the two formulations, which is what makes the identity evidence).
  *
  * Usage: python3 tools/events_gen.py /tmp/events24m 24000000 64 &&
  *   sbt "Test/runMain graft.FunnelVolBench /tmp/events24m"
  */
object FunnelVolBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/events24m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    shufWrite.set(0)
    val t1 = System.nanoTime()
    val cascade = Registry.queriesMap("q113_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    val casS = (System.nanoTime() - t1) / 1e9
    val reached = cascade.values.groupBy(_._1).view.mapValues(_.size).toMap
    println(f"FNVCASCADE ${cascade.size}%,d funnel users in $casS%5.1f s  " +
      f"shufWrite=${shufWrite.get / 1e9}%.2f GB  " +
      f"reached 1/2/3 = ${reached.getOrElse(1, 0)}%,d/${reached.getOrElse(2, 0)}%,d/${reached.getOrElse(3, 0)}%,d")

    // Independent per-user imperative walk.
    shufWrite.set(0)
    val t2 = System.nanoTime()
    val walked = Tables.load(spark, dir, "events")
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val evs = it.map(e => (e._2, e._3)).toArray
        var t1v = Long.MaxValue
        evs.foreach { case (us, ty) => if (ty == "view" && us < t1v) t1v = us }
        if (t1v == Long.MaxValue) (uid, 0, -1L, -1L)
        else {
          var t2v = Long.MaxValue
          evs.foreach { case (us, ty) => if (ty == "click" && us > t1v && us < t2v) t2v = us }
          if (t2v == Long.MaxValue) (uid, 1, -1L, -1L)
          else {
            var t3v = Long.MaxValue
            evs.foreach { case (us, ty) => if (ty == "purchase" && us > t2v && us < t3v) t3v = us }
            if (t3v == Long.MaxValue) (uid, 2, t2v - t1v, -1L)
            else (uid, 3, t2v - t1v, t3v - t2v)
          }
        }
      }
      .filter(_._2 > 0)
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val walkS = (System.nanoTime() - t2) / 1e9
    println(f"FNVWALK    independent mapGroups walk in $walkS%5.1f s  " +
      f"shufWrite=${shufWrite.get / 1e9}%.2f GB")

    require(cascade == walked, {
      val diff = (cascade.keySet ++ walked.keySet)
        .filter(k => cascade.get(k) != walked.get(k)).take(3)
      s"plans disagree on ${diff.size}+ users, e.g. " +
        diff.map(k => s"$k: ${cascade.get(k)} vs ${walked.get(k)}").mkString("; ")
    })
    println(f"FNVVERIFY  cascade == imperative walk, all ${cascade.size}%,d users")
    spark.stop()
  }
}
