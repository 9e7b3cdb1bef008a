package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q113's funnel semantics on crafted event streams — the cases the
  * sf events table never isolates (its dense random streams complete
  * every funnel): partial funnels, the STRICTLY-AFTER rule (a click
  * before the first view is not funnel progress), users with no view
  * absent entirely, and exact microsecond latencies. */
class FunnelSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long, micro: Long = 0): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(sec * 1000L)
    t.setNanos((micro * 1000L).toInt)
    t
  }

  test("crafted streams: partial funnels, strictly-after, exact micros") {
    val rows = Seq(
      // user 1: full funnel; v2c = 5s + 7us, c2p = 10s exactly.
      (0L, ts(100), 1L, "view", 0.0, "{}"),
      (1L, ts(105, 7), 1L, "click", 0.0, "{}"),
      (2L, ts(115, 7), 1L, "purchase", 0.0, "{}"),
      // later duplicates must not change the mins:
      (3L, ts(200), 1L, "click", 0.0, "{}"),
      // user 2: view + click, no purchase -> reached 2.
      (4L, ts(100), 2L, "view", 0.0, "{}"),
      (5L, ts(101), 2L, "click", 0.0, "{}"),
      // user 3: view only (their purchase precedes any click) -> 1.
      (6L, ts(100), 3L, "view", 0.0, "{}"),
      (7L, ts(99), 3L, "purchase", 0.0, "{}"),
      // user 4: click BEFORE first view, nothing after -> reached 1.
      (8L, ts(50), 4L, "click", 0.0, "{}"),
      (9L, ts(100), 4L, "view", 0.0, "{}"),
      // user 5: purchase after view but BEFORE the first valid click
      // -> purchase doesn't count (strictly after t2): reached 2.
      (10L, ts(100), 5L, "view", 0.0, "{}"),
      (11L, ts(105), 5L, "purchase", 0.0, "{}"),
      (12L, ts(110), 5L, "click", 0.0, "{}"),
      // user 6: no view at all -> absent from the output.
      (13L, ts(100), 6L, "click", 0.0, "{}"),
      (14L, ts(101), 6L, "purchase", 0.0, "{}"))
    val tmp = java.nio.file.Files.createTempDirectory("q113spec").toString
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Registry.queriesMap("q113_funnel")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), s"got ${got.keySet}")
    assert(got(1L) == ((3, 5000007L, 10000000L)), s"user 1: ${got(1L)}")
    assert(got(2L) == ((2, 1000000L, null)))
    assert(got(3L) == ((1, null, null)))
    assert(got(4L) == ((1, null, null)), "pre-view click must not count")
    assert(got(5L) == ((2, 10000000L, null)),
      "purchase before the first valid click must not count")
  }
}
