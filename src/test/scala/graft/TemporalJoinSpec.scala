package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Boundary-semantics micro-fixtures for the temporal join operators
  * (q29 as-of, q39 interval range join): a tiny synthetic `events`
  * parquet is written to a temp dir and the REGISTERED queries run
  * against it, pinning the semantics the DuckDB oracle checks at
  * corpus scale — inclusive at-or-before matching for as-of (equal
  * timestamps match), closed ±5min interval bounds, self-pair
  * exclusion, and unmatched-probe null handling.
  */
class TemporalJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (event_id, second-offset, user, type) rows → events.parquet. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tj").toString
    rows.map { case (id, sec, user, tpe) =>
      (id, new Timestamp(1700000000000L + sec * 1000), user, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q29 as-of: equal timestamps match, latest anchor wins, no-anchor stays unmatched") {
    val dir = eventsDir(Seq(
      (1L, 100L, 1L, "view"),   // anchor
      (2L, 200L, 1L, "view"),   // later anchor
      (3L, 200L, 1L, "click"),  // equal ts → matches anchor at 200 (gap 0)
      (4L, 150L, 1L, "error"),  // between anchors → matches 100 (gap 50)
      (5L, 300L, 2L, "click"))) // user 2 has no anchor → unmatched
    val got = Registry.queriesMap("q29_asof_join")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.toString.toDouble)))
    assert(got.toSeq == Seq(
      ("click", 2L, 1L, Some(0.0)),   // one matched (gap 0), one unmatched
      ("error", 1L, 1L, Some(50.0))))
  }

  test("q39 range join: closed +/-5min bounds, self excluded") {
    val dir = eventsDir(Seq(
      (1L, 1000L, 1L, "signup"),
      (2L, 700L, 2L, "click"),   // exactly -300s → included (closed bound)
      (3L, 1300L, 3L, "view"),   // exactly +300s → included
      (4L, 1301L, 4L, "error"),  // 301s after → excluded
      (5L, 699L, 5L, "click"))) // 301s before → excluded
    val got = Registry.queriesMap("q39_range_join")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("click", 1L), ("view", 1L)))
  }
}
