package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q114's cohort semantics on crafted streams: first-seen day defines
  * the cohort regardless of event type, multiple same-day events
  * count once, gaps leave missing cells (not zeros), and retention
  * normalizes by the cohort's own day-0 size. */
class RetentionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(day: Int, hour: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")

  test("crafted cohorts: first-seen day, same-day dedupe, gaps, normalization") {
    val rows = Seq(
      // Cohort Jan 1: users 1, 2.
      //   user 1 active days 1, 2, 4 (two events on day 2 dedupe).
      (0L, ts(1, 9), 1L, "view", 0.0, "{}"),
      (1L, ts(2, 9), 1L, "click", 0.0, "{}"),
      (2L, ts(2, 18), 1L, "view", 0.0, "{}"),
      (3L, ts(4, 9), 1L, "purchase", 0.0, "{}"),
      //   user 2 active day 1 only.
      (4L, ts(1, 23), 2L, "error", 0.0, "{}"),
      // Cohort Jan 3: user 3 active days 3 and 4.
      (5L, ts(3, 9), 3L, "signup", 0.0, "{}"),
      (6L, ts(4, 9), 3L, "view", 0.0, "{}"))
    val tmp = java.nio.file.Files.createTempDirectory("q114spec").toString
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Registry.queriesMap("q114_retention")(spark, tmp)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> ((2L, 1.0)),
      ("2024-01-01", 1) -> ((1L, 0.5)),
      ("2024-01-01", 3) -> ((1L, 0.5)), // day 3 missing: gap, not zero
      ("2024-01-03", 0) -> ((1L, 1.0)),
      ("2024-01-03", 1) -> ((1L, 1.0))), s"got $got")
  }
}
