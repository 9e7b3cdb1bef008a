package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.StreamingOps
import graft.queries.StreamingOps.{CtrlEvent, FunnelOutE}

/** q130's control-stream erasure semantics, fired on crafted
  * multi-batch replays where each arrival shape is observable:
  * the request BETWEEN the user's events (tombstone + flagged
  * restart), BEFORE them (no tombstone, pre-T stragglers skipped),
  * AFTER them over pure post-T state (kept, re-emitted flagged —
  * the no-pre-T-report case), never-returning (tombstone on the
  * request row itself — no timer needed, the request is in-band),
  * the exact-T tie (request processes first), and the one
  * irrecoverable shape — state mixing eras — which must raise
  * in-handler. Then the sf pins: the registered q130 equals the
  * per-user-T filtered recompute in-engine, differs from q115
  * (erasure non-vacuous) and from q127 (the per-user instants are a
  * real generalization of the fixed-T operator). */
class StreamCtrlEraseSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val MinUs = 60L * 1000000
  private def ev(u: Long, m: Long, ty: String) =
    CtrlEvent(u, m * MinUs, ty, 0)
  private def req(u: Long, m: Long) =
    CtrlEvent(u, m * MinUs, "erase_request", 1)

  private def writeFile(inputDir: java.nio.file.Path, rows: Seq[CtrlEvent],
      name: String, mtime: Long): Unit = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ctrl_src_")
    spark.createDataset(rows).coalesce(1).write.mode("overwrite").parquet(s"$tmp/d")
    val part = new java.io.File(s"$tmp/d").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val dest = inputDir.resolve(name)
    java.nio.file.Files.move(part.toPath, dest)
    assert(dest.toFile.setLastModified(mtime))
  }

  private def runStream(inputDir: java.nio.file.Path, dataDir: String): Unit = {
    import spark.implicits._
    val chk = java.nio.file.Files.createTempDirectory("graft_ctrl_chk_").toString
    val in = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[CtrlEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inputDir.toString)
      .as[CtrlEvent]
    val q = in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        StreamingOps.funnelStepCtrl _)
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelOutE], id: Long) =>
        batch.toDF().write.mode("overwrite").parquet(s"$dataDir/b$id"); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("multi-batch request arrival shapes: between, before, after, never-returns, exact tie") {
    val root = java.nio.file.Files.createTempDirectory("graft_ctrl_")
    val inputDir = java.nio.file.Files.createDirectory(root.resolve("in"))
    val dataDir = s"$root/data"
    val base = System.currentTimeMillis() - 60000
    val (rA, rB, rC, rD, rE, k) = (1L, 2L, 3L, 4L, 5L, 6L)
    // T = minute 100 for every crafted request.
    // rA: view+click pre-T (reported step 2), request, then returns
    //     -> tombstone + flagged restart reaching step 2 again.
    // rB: request arrives FIRST; post-T view in a later batch; then a
    //     pre-T straggler view which must be skipped, not accumulated.
    // rC: post-T view+click BEFORE the request row arrives (pure
    //     post-T state) -> kept, marked, re-emitted flagged.
    // rD: pre-T view only, then the request -> tombstone on the
    //     request row itself; absent from current.
    // rE: pre-T view, then request AND a view at exactly T in one
    //     batch -> the request processes first, the tied view lands
    //     in the post-T era (restart at step 1).
    // k:  no request; plain q115 citizen.
    writeFile(inputDir, Seq(
      ev(rA, 0, "view"), ev(rA, 1, "click"),
      ev(rC, 120, "view"), ev(rC, 130, "click"),
      ev(rD, 0, "view"),
      ev(rE, 50, "view"),
      ev(k, 0, "view"),
      req(rB, 100)), "f0.parquet", base)
    writeFile(inputDir, Seq(
      req(rA, 100), req(rC, 100), req(rD, 100),
      req(rE, 100), ev(rE, 100, "view"),
      ev(rB, 150, "view"),
      ev(k, 10, "click")), "f1.parquet", base + 2000)
    writeFile(inputDir, Seq(
      ev(rA, 150, "view"), ev(rA, 160, "click"),
      ev(rB, 50, "view")), "f2.parquet", base + 4000)
    runStream(inputDir, dataDir)
    import spark.implicits._
    val raw = spark.read.option("recursiveFileLookup", "true")
      .schema(implicitly[org.apache.spark.sql.Encoder[FunnelOutE]].schema)
      .parquet(dataDir)
    val rows = raw.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(4))).toSeq
    // Tombstones: rA (reported pre-T progress), rD (never returns —
    // the request row itself erases, no timer), rE (tie case). None
    // for rB (nothing reported pre-T) or rC (no pre-T report exists).
    assert(rows.count { case (u, s, e) => u == rA && s == 0 && e } == 1)
    assert(rows.count { case (u, s, e) => u == rD && s == 0 && e } == 1,
      "never-returning user must erase on the request row itself")
    assert(rows.count { case (u, s, e) => u == rE && s == 0 && e } == 1)
    assert(!rows.exists { case (u, s, _) => (u == rB || u == rC) && s == 0 },
      s"rB/rC must not tombstone — nothing pre-T was reported: $rows")
    // rC's re-emit is flagged at its standing step.
    assert(rows.contains((rC, 2, true)),
      s"late request over pure post-T state must re-emit flagged: $rows")
    // Current view: rA restarted to step 2, rB's straggler skipped
    // (step 1 from the post-T view only), rC kept at step 2, rD gone,
    // rE restarted at the tied view, k plain step 2.
    val cur = StreamingOps.funnelCurrent(raw)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cur == Map(rA -> 2, rB -> 1, rC -> 2, rE -> 1, k -> 2),
      s"unexpected current state: $cur")
    // rA's restart latency is the post-T one (10 min), not the pre-T.
    val rArow = StreamingOps.funnelCurrent(raw)
      .where(col("user_id") === rA).collect().head
    assert(rArow.getLong(2) == 10 * MinUs, s"rA v2c: $rArow")
  }

  test("guard: state mixing eras when the request arrives raises in-handler") {
    val root = java.nio.file.Files.createTempDirectory("graft_ctrlg_")
    val inputDir = java.nio.file.Files.createDirectory(root.resolve("in"))
    val base = System.currentTimeMillis() - 60000
    // g: pre-T view (t1=0) and post-T click (t2=120) both land before
    // the request (T=100) — the post-T cascade's own t1 is unknowable,
    // so the handler must fail loudly, not guess.
    writeFile(inputDir, Seq(ev(7L, 0, "view"), ev(7L, 120, "click")),
      "f0.parquet", base)
    writeFile(inputDir, Seq(req(7L, 100)), "f1.parquet", base + 2000)
    import spark.implicits._
    val chk = java.nio.file.Files.createTempDirectory("graft_ctrlg_chk_").toString
    val in = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[CtrlEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inputDir.toString)
      .as[CtrlEvent]
    val q = in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        StreamingOps.funnelStepCtrl _)
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", chk)
      .format("noop")
      .trigger(Trigger.AvailableNow()).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("q130 arrival-order violation"),
      s"guard must surface, got: ${msgs(ex).take(300)}")
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q130 == per-user-T filtered recompute, non-vacuous") {
      val dir = s"/root/testdata/$sf"
      val got = Registry.queriesMap("q130_funnel_erase_requests")(spark, dir)
        .collect().map(_.toSeq).toSeq
      // In-engine oracle twin: q113's cascade with each erased user's
      // events filtered by their OWN request instant.
      val e = queries.t(spark, dir, "events")
      val reqT = lit(StreamingOps.Q130BaseUs) +
        (queries.h60(concat(lit("reqday:"), col("user_id")))
          % StreamingOps.Q130RangeDays) * lit(86400000000L)
      val filtered = e.where(
        !(queries.h60(concat(lit("erase:"), col("user_id"))) % 10 === 0) ||
          unix_micros(col("ts")) >= reqT)
      val want = queries.Analytic.funnelStates(filtered)
        .select(col("user_id"),
          when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
            .otherwise(1).cast("int").as("reached_step"),
          (unix_micros(col("t2")) - unix_micros(col("t1"))).as("v2c_micros"),
          (unix_micros(col("t3")) - unix_micros(col("t2"))).as("c2p_micros"))
        .orderBy(col("user_id"))
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"q130 != filtered recompute at $dir")
      if (sf == "sf0.01") {
        // Non-vacuity only at sf0.01: sf0.001 has a single erased user
        // whose hashed request instant happens to precede all three of
        // their funnel anchors, so the filter changes nothing there.
        val plain = Registry.queriesMap("q115_stream_funnel")(spark, dir)
          .collect().map(_.toSeq).toSeq
        assert(got != plain, s"erasure changed nothing at $dir — vacuous replay")
        // The per-user instants are a real generalization: the fixed-T
        // q127 must disagree somewhere (some user's T != 2024-01-08).
        val fixedT = Registry.queriesMap("q127_stream_funnel_user_erase")(spark, dir)
          .collect().map(_.toSeq).toSeq
        assert(got != fixedT,
          "q130 == q127 — the per-user request instants changed nothing")
      }
    }
  }
}
