package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.StreamingOps
import graft.queries.StreamingOps.{FunnelEventWm, FunnelOutE}

/** q127's in-stream user-erasure semantics, fired OBSERVABLY on
  * crafted multi-batch replays (the sf replay is one data batch, where
  * the registered oracle already re-proves the outcome cross-engine):
  * a pending user's first post-T event forgets their state and emits
  * the tombstone before restarting; a pending user who never returns
  * erases by the T event-time timer (including the pre-T-COMPLETED
  * funnel, which must NOT silently retire past its deletion); the
  * current-state projection drops fully-forgotten users and reports
  * restarts from their flagged rows only; non-erased users behave as
  * q121. Plus the h60Jvm == h60-column pin the handler-side predicate
  * rests on. */
class StreamEraseSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("h60Jvm mirrors the h60 column exactly") {
    val s = spark
    import s.implicits._
    val ids = (0L to 300L).toSeq
    val col60 = ids.toDF("user_id")
      .select(col("user_id"),
        queries.h60(concat(lit("erase:"), col("user_id"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { u =>
      assert(StreamingOps.h60Jvm(s"erase:$u") == col60(u), s"uid $u")
    }
  }

  // Crafted uids with known predicate values (scanned, not assumed).
  private lazy val erasedIds =
    (1L to 300L).filter(StreamingOps.streamErased).toList
  private lazy val keptIds =
    (1L to 300L).filterNot(StreamingOps.streamErased).toList

  private val MinUs = 60L * 1000000
  private val Off = 100000L // epoch-0 watermark guard (StreamRetireSpec)
  private def fev(u: Long, m: Long, ty: String) =
    FunnelEventWm(u, new Timestamp((Off + m) * 60000), (Off + m) * MinUs, ty)

  private def writeSourceFile(rows: Seq[FunnelEventWm],
      inputDir: java.nio.file.Path, name: String, mtime: Long): Unit = {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_esrc_")
    spark.createDataset(rows).coalesce(1).write.mode("overwrite").parquet(s"$tmp/d")
    val part = new java.io.File(s"$tmp/d").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head
    val dest = inputDir.resolve(name)
    java.nio.file.Files.move(part.toPath, dest)
    assert(dest.toFile.setLastModified(mtime))
  }

  test("multi-batch erasure: tombstone + restart, timer erase, completed-funnel erase") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_erase_s_")
    val inputDir = java.nio.file.Files.createDirectory(root.resolve("in"))
    val dataDir = s"$root/data"
    val base = System.currentTimeMillis() - 60000
    val eraseUs = (Off + 100) * MinUs // T at fixture minute 100
    val List(e1, e2, e3) = erasedIds.take(3)
    val k1 = keptIds.head
    // e1: view+click pre-T (reported step 2), returns with a view at
    //     minute 150 -> tombstone + restart at step 1.
    // e2: view pre-T (reported step 1), never returns -> T timer
    //     erases silently-but-for-the-tombstone; absent from current.
    // e3: COMPLETES pre-T (step 3) -> must still erase by timer
    //     (the silent-retire leak case).
    // k1: kept user, view pre-T + click post-T -> plain q121 behavior.
    writeSourceFile(Seq(
      fev(e1, 0, "view"), fev(e1, 1, "click"),
      fev(e2, 0, "view"),
      fev(e3, 0, "view"), fev(e3, 1, "click"), fev(e3, 2, "purchase"),
      fev(k1, 0, "view")), inputDir, "f0.parquet", base)
    writeSourceFile(Seq(fev(e1, 150, "view"), fev(k1, 160, "click")),
      inputDir, "f1.parquet", base + 2000)
    val chk = java.nio.file.Files.createTempDirectory("graft_erase_chk_").toString
    val in = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[FunnelEventWm]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inputDir.toString)
      .withWatermark("ts", "0 seconds")
      .as[FunnelEventWm]
    val q = in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        StreamingOps.funnelStepErasing(eraseUs))
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelOutE], id: Long) =>
        batch.toDF().write.mode("overwrite").parquet(s"$dataDir/b$id"); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val raw = spark.read.option("recursiveFileLookup", "true")
      .schema(implicitly[org.apache.spark.sql.Encoder[FunnelOutE]].schema)
      .parquet(dataDir)
    val rows = raw.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(4))).toSeq
    // Tombstones: e1 (in-call, prior reported state), e2 + e3 (timer).
    assert(rows.count { case (u, s2, e) => u == e1 && s2 == 0 && e } == 1)
    assert(rows.count { case (u, s2, e) => u == e2 && s2 == 0 && e } == 1,
      "never-returning pending user must erase by the T timer")
    assert(rows.count { case (u, s2, e) => u == e3 && s2 == 0 && e } == 1,
      "a pre-T-completed funnel must erase by timer, not silently retire")
    // e1's restart row is flagged; its pre-erase step-2 row is not.
    assert(rows.contains((e1, 2, false)) && rows.contains((e1, 1, true)))
    // Current-state projection: e1 restarted at step 1, e2/e3 gone,
    // k1 reported at step 2 (plain funnel).
    val cur = StreamingOps.funnelCurrent(raw)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cur == Map(e1 -> 1, k1 -> 2), s"unexpected current state: $cur")
  }

  test("sf replay: q127 == filtered recompute, and the erasure is non-vacuous") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = Registry.queriesMap("q127_stream_funnel_user_erase")(spark, dir)
        .collect().map(_.toSeq).toSeq
      // In-engine oracle twin: q113's cascade over the erasure-filtered
      // event relation (the registered DuckDB oracle's semantics).
      val e = queries.t(spark, dir, "events")
      val eraseTs = lit("2024-01-08").cast("timestamp")
      val filtered = e.where(
        !(queries.h60(concat(lit("erase:"), col("user_id"))) % 10 === 0) ||
          col("ts") >= eraseTs)
      val want = queries.Analytic.funnelStates(filtered)
        .select(col("user_id"),
          when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
            .otherwise(1).cast("int").as("reached_step"),
          (unix_micros(col("t2")) - unix_micros(col("t1"))).as("v2c_micros"),
          (unix_micros(col("t3")) - unix_micros(col("t2"))).as("c2p_micros"))
        .orderBy(col("user_id"))
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"q127 != filtered recompute at $dir")
      // Non-vacuity: at least one erased user's report must differ
      // from the unfiltered stream funnel's (q115).
      val plain = Registry.queriesMap("q115_stream_funnel")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got != plain, s"erasure changed nothing at $dir — vacuous replay")
    }
  }
}
