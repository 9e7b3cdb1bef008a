package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q115 == q113 pinned in CI (the q96==q98 pattern): the streaming
  * funnel's final state must equal the batch cascade's relation on
  * both sf oracle scales, and on the crafted FunnelSpec corpus whose
  * within-batch disorder (pre-view clicks, dead purchases) exercises
  * the in-group sort. */
class StreamFunnelSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(q: String, dir: String) =
    Registry.queriesMap(q)(spark, dir).collect().map(_.toSeq).toSeq

  test("stream == batch on sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val batch = rows("q113_funnel", dir)
      val stream = rows("q115_stream_funnel", dir)
      assert(stream == batch, s"stream != batch at $dir")
      assert(batch.nonEmpty)
    }
  }

  test("crafted disorder: the in-group sort reproduces batch semantics") {
    def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      // user 1 events deliberately written out of time order.
      (0L, ts(115), 1L, "purchase", 0.0, "{}"),
      (1L, ts(100), 1L, "view", 0.0, "{}"),
      (2L, ts(105), 1L, "click", 0.0, "{}"),
      // user 2: click precedes the only view -> reached 1.
      (3L, ts(50), 2L, "click", 0.0, "{}"),
      (4L, ts(100), 2L, "view", 0.0, "{}"))
    val tmp = java.nio.file.Files.createTempDirectory("q115spec").toString
    spark.createDataFrame(events)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    assert(rows("q115_stream_funnel", tmp) == rows("q113_funnel", tmp))
    val got = rows("q115_stream_funnel", tmp)
    assert(got.map(r => (r(0), r(1))) == Seq((1L, 3), (2L, 1)), s"got $got")
  }
}
