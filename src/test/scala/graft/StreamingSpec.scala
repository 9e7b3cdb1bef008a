package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch Structured Streaming semantics the one-shot
  * AvailableNow queries can't exercise: event-time watermarks closing
  * windows in append mode and dropping late data, and streaming
  * dedup state spanning micro-batches.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermark closes 10-min windows in append mode and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .select(col("window.start").cast("string").as("w"), col("n"), col("sum_v"))
    val q = agg.writeStream.format("memory").queryName("wm_append")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // Batch 1: two rows in the 10:00 window, one in 10:10.
      input.addData((ts(1), 1L), (ts(4), 2L), (ts(11), 10L))
      q.processAllAvailable()
      // Append mode: nothing emitted yet — no window is below watermark.
      assert(spark.table("wm_append").count() == 0)

      // Batch 2: event at 10:26 advances the watermark to 10:21 ≥ the
      // 10:10 window's end → both early windows close and emit.
      input.addData((ts(26), 100L))
      q.processAllAvailable()
      // One more batch so the advanced watermark is applied to state.
      input.addData((ts(27), 1000L))
      q.processAllAvailable()
      val closed = spark.table("wm_append").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(closed == Set(
        ("2024-01-01 10:00:00", 2L, 3L),
        ("2024-01-01 10:10:00", 1L, 10L)))

      // A row behind the watermark (10:02 << 10:17) is dropped: the
      // 10:00 window NEVER re-emits.
      input.addData((ts(2), 999L))
      q.processAllAvailable()
      val after = spark.table("wm_append").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(after == closed)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps one running aggregate per key across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val totals = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState[Double, (Long, Double)](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (user, rows, state: org.apache.spark.sql.streaming.GroupState[Double]) =>
          val sum = state.getOption.getOrElse(0.0) + rows.map(_._2).sum
          state.update(sum)
          (user, sum)
      }
    val q = totals.toDF("user_id", "total").writeStream
      .format("memory").queryName("running_totals")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      input.addData((1L, 1.0), (3L, 7.0))
      q.processAllAvailable()
      // Update-mode memory sink appends each batch's updated rows;
      // totals only grow, so max per key = the current state (robust
      // to collect order across batch blocks).
      val latest = spark.table("running_totals").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(latest == Map(1L -> 16.0, 2L -> 1.0, 3L -> 7.0))
    } finally q.stop()
  }

  test("streaming dropDuplicates state spans micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dedup = input.toDF().toDF("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
    val q = dedup.writeStream.format("memory").queryName("dedup_batches")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData((1L, "click"), (1L, "click"), (2L, "view"))
      q.processAllAvailable()
      assert(spark.table("dedup_batches").count() == 2)
      // Same keys in a LATER batch are still suppressed by state.
      input.addData((1L, "click"), (2L, "view"), (3L, "click"))
      q.processAllAvailable()
      val rows = spark.table("dedup_batches").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "click"), (2L, "view"), (3L, "click")))
    } finally q.stop()
  }
}
