package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Volume run for q130's control-stream erasure: 28.7M events replayed
  * through real micro-batches (64 time-ordered events_gen part files,
  * 8 per trigger) UNIONED with a genuine second stream of erase
  * requests — 5 per-T-day request files, 1 per trigger, mtime-ordered
  * so each request reaches the store BEFORE any >= T event (the
  * time-order contract a production privacy feed satisfies), while
  * landing mid-stream so the tombstone/restart paths fire at volume
  * (~24k users with per-user instants spread over corpus days 1-5).
  *
  * Verification is the registered oracle's identity at 28.7M events:
  * the current-state projection must equal the batch funnel over the
  * per-user-T-filtered relation EXACTLY — steps AND latencies, every
  * user (NoTimeout handler: erasure is the only state remover, so no
  * retirement deviation class exists here at all).
  *
  * Usage: sbt "Test/runMain graft.StreamCtrlEraseVolBench /tmp/events24m"
  */
object StreamCtrlEraseVolBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/events24m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Per-user T = corpus day 1 + (h60("reqday:"+u) % 5) days.
    val baseUs = java.time.Instant.parse("2025-01-02T00:00:00Z").toEpochMilli * 1000
    val rangeDays = 5
    val DayUs = 86400000000L
    val parts = s"$dir/events_parts"
    val schema = spark.read.parquet(parts).schema
    val e = Tables.load(spark, dir, "events")

    // Request fixture: one file per T-day, mtimes ascending and older
    // than every event part, so trigger k (maxFilesPerTrigger=1 on
    // this source) delivers day-(1+k) requests while the event source
    // is still replaying day < 1+k — in event-time order, mid-stream.
    val reqT = lit(baseUs) +
      (queries.h60(concat(lit("reqday:"), col("user_id"))) % rangeDays) * lit(DayUs)
    val reqAll = e
      .where(queries.h60(concat(lit("erase:"), col("user_id"))) % 10 === 0)
      .select(col("user_id")).distinct()
      .select(col("user_id"), reqT.as("req_us"))
    val reqDir = java.nio.file.Files.createTempDirectory("ctrl_req_").toString
    val tmp = java.nio.file.Files.createTempDirectory("ctrl_req_tmp_").toString
    val t0 = System.currentTimeMillis() - 3600000
    for (d <- 0 until rangeDays) {
      reqAll.where(col("req_us") === baseUs + d * DayUs)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/d$d")
      val part = new java.io.File(s"$tmp/d$d").listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      val dest = new java.io.File(reqDir, f"req_$d%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      require(dest.setLastModified(t0 + d * 1000))
    }
    val nReq = reqAll.count()

    val scratch = java.nio.file.Files.createTempDirectory("ctrl_erase_").toString
    val (data, chk) = (s"$scratch/data", s"$scratch/chk")
    val t1 = System.nanoTime()
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 8)
      .parquet(parts)
    val requests = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("user_id", org.apache.spark.sql.types.LongType)
        .add("req_us", org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", 1)
      .parquet(reqDir)
    val out = queries.StreamingOps.ctrlUnion(spark, events, requests)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        queries.StreamingOps.funnelStepCtrl _)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[queries.StreamingOps.FunnelOutE], id: Long) =>
        b.toDF().write.mode("append").parquet(data); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stateRows = q.recentProgress.toSeq.sortBy(_.batchId)
      .filter(_.stateOperators.nonEmpty)
      .map(p => p.stateOperators.map(_.numRowsTotal).sum)
    val wallS = (System.nanoTime() - t1) / 1e9
    val raw = spark.read.schema(org.apache.spark.sql.Encoders
      .product[queries.StreamingOps.FunnelOutE].schema).parquet(data)
    val tombs = raw.where(col("reached_step") === 0).count()
    val flagged = raw.where(col("erased") && col("reached_step") > 0).count()
    val users = e.select(col("user_id")).distinct().count()
    println(f"CTRLERASE 28.7M events + $nReq%,d mid-stream erase requests " +
      f"replayed in $wallS%5.1f s  tombstones=$tombs%,d  post-erase rows=" +
      f"$flagged%,d  state peak=${stateRows.max}%,d final=${stateRows.last}%,d " +
      f"for $users%,d users")
    require(tombs > 0 && flagged > 0,
      "control-stream erasure branches unfired at volume")
    require(stateRows.max <= 2 * users, "state not user-bounded")

    // The registered oracle's identity at volume: current state ==
    // batch funnel over each user's OWN request-instant filter.
    val filtered = e.where(
      !(queries.h60(concat(lit("erase:"), col("user_id"))) % 10 === 0) ||
        unix_micros(col("ts")) >= reqT)
    val want = queries.Analytic.funnelStates(filtered)
      .select(col("user_id"),
        when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
          .otherwise(1).cast("int").as("w_step"),
        (unix_micros(col("t2")) - unix_micros(col("t1"))).as("w_v2c"),
        (unix_micros(col("t3")) - unix_micros(col("t2"))).as("w_c2p"))
    val cur = queries.StreamingOps.funnelCurrent(raw)
    val bad = cur.join(want, Seq("user_id"), "full")
      .where(!(col("reached_step") <=> col("w_step")) ||
             !(col("v2c_micros") <=> col("w_v2c")) ||
             !(col("c2p_micros") <=> col("w_c2p"))).count()
    require(bad == 0,
      s"$bad users differ from the per-user-T filtered batch recompute")
    println(f"CTRLVERIFY current state (${cur.count()}%,d users) == per-user-T " +
      "filtered batch funnel, steps AND latencies, 0 mismatches " +
      "(requests as data, no compile-time erase set anywhere)")
    spark.stop()
  }
}
