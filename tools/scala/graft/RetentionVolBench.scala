package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Volume run for q114's retention matrix at 28.7M events / 240k
  * users. Verification is by exact PARTITION invariants of the cell
  * relation (every (user, day) activity lands in exactly one cell;
  * every user in exactly one cohort), checked against independently
  * computed totals:
  *
  *   - Σ n_users over all cells == |distinct (user, day)|
  *   - Σ cohort day-0 sizes == |distinct users|
  *   - day-0 retention == 1.0 for every cohort
  *
  * Usage: sbt "Test/runMain graft.RetentionVolBench /tmp/events24m"
  */
object RetentionVolBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/events24m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    shufWrite.set(0)
    val t1 = System.nanoTime()
    val cells = Registry.queriesMap("q114_retention")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getDouble(3)))
    val wallS = (System.nanoTime() - t1) / 1e9
    println(f"RETRUN    ${cells.length}%,d retention cells over 28.7M events in " +
      f"$wallS%5.1f s  shufWrite=${shufWrite.get / 1e9}%.2f GB")

    val e = Tables.load(spark, dir, "events")
    val userDays = e.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().count()
    val users = e.select(col("user_id")).distinct().count()
    val cellSum = cells.map(_._3).sum
    val day0Sum = cells.filter(_._2 == 0).map(_._3).sum
    val badDay0 = cells.filter(c => c._2 == 0 && c._4 != 1.0)
    require(cellSum == userDays,
      s"cells must partition (user, day) activity: $cellSum vs $userDays")
    require(day0Sum == users,
      s"cohorts must partition users: $day0Sum vs $users")
    require(badDay0.isEmpty, s"day-0 retention must be 1.0: ${badDay0.take(3)}")
    println(f"RETVERIFY cells partition activity ($cellSum%,d user-days) and " +
      f"cohorts partition users ($users%,d); day-0 retention 1.0 for all " +
      f"${cells.count(_._2 == 0)}%,d cohorts")
    spark.stop()
  }
}
