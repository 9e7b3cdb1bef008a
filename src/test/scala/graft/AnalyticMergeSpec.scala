package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q119/q120's incremental-equals-recompute contracts. Both merges are
  * exact only under the time-ordered ingest contract (every batch
  * event at or after the cutoff, every standing event before it), so
  * the crafted cases here all respect it — the interesting branches
  * are WHAT crosses the boundary: a funnel step completing from the
  * batch while its anchor lives in standing state, a pre-anchor batch
  * click that must stay discarded, a batch-only user running the whole
  * cascade locally, and for retention a new-user cohort opening in the
  * batch window vs an old cohort's activity landing in new cells. The
  * sf replays then pin merge == full recompute on the real event
  * tables — the same identity the registered oracles re-prove
  * cross-engine every round. */
class AnalyticMergeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** events(user_id, event_type, ts) from (user, type, minutes) rows —
    * minute offsets from an arbitrary epoch keep the fixtures legible. */
  private def events(rows: (Long, String, Int)*) = {
    val s = spark
    import s.implicits._
    rows.map { case (u, ty, m) =>
      (u, ty, new Timestamp(1700000000000L + m * 60000L)) }
      .toDF("user_id", "event_type", "ts")
  }

  private val CutMin = 100 // fixture boundary: standing < 100 <= batch

  private def funnelRows(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Any, Any)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))).toMap

  /** Merge path vs q113-style full recompute over standing ∪ batch,
    * compared through the registered presentation (reached_step +
    * exact latencies); returns the merged rows for branch asserts. */
  private def checkedFunnel(all: Seq[(Long, String, Int)]): Map[Long, (Int, Any, Any)] = {
    val e = events(all: _*)
    val standing = queries.Analytic.funnelStates(
      e.where(col("ts") < lit(new Timestamp(1700000000000L + CutMin * 60000L))))
    val merged = queries.Analytic.mergeFunnelStates(
      standing, e.where(col("ts") >= lit(new Timestamp(1700000000000L + CutMin * 60000L))))
    val full = queries.Analytic.funnelStates(e)
    def render(st: org.apache.spark.sql.DataFrame) = funnelRows(
      st.select(col("user_id"),
        when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
          .otherwise(1).cast("int").as("reached_step"),
        (unix_micros(col("t2")) - unix_micros(col("t1"))).as("v2c"),
        (unix_micros(col("t3")) - unix_micros(col("t2"))).as("c2p")))
    val (got, want) = (render(merged), render(full))
    assert(got == want, "merge must equal the full recompute")
    got
  }

  test("funnel: steps complete across the boundary from standing anchors") {
    // u1: view+click standing, purchase in batch -> step 3.
    // u2: view standing, click in batch -> step 2 with cross-boundary latency.
    val got = checkedFunnel(Seq(
      (1L, "view", 10), (1L, "click", 20), (1L, "purchase", 110),
      (2L, "view", 30), (2L, "click", 120)))
    assert(got(1L)._1 == 3 && got(2L)._1 == 2)
    assert(got(2L)._2 == 90L * 60000000L, "cross-boundary latency must be exact")
  }

  test("funnel: pre-anchor click stays discarded; later batch click completes") {
    // u1's only standing click precedes its first view (not funnel
    // progress — q113 discards it); the batch click must become t2
    // against the STANDING t1, not the discarded click.
    val got = checkedFunnel(Seq(
      (1L, "click", 5), (1L, "view", 10), (1L, "click", 130)))
    assert(got(1L)._1 == 2)
    assert(got(1L)._2 == 120L * 60000000L)
  }

  test("funnel: batch-only user runs the whole cascade locally, order enforced") {
    // u1 completes in-batch; u2's batch click precedes its batch view
    // -> no step 2 (same discard rule, batch-local).
    val got = checkedFunnel(Seq(
      (1L, "view", 110), (1L, "click", 120), (1L, "purchase", 130),
      (2L, "click", 110), (2L, "view", 120)))
    assert(got(1L)._1 == 3)
    assert(got(2L)._1 == 1)
  }

  test("funnel: set steps never move; click-only user stays absent") {
    // u1 already reached step 3 in standing; batch repeats every event
    // type later — no timestamp may change. u2 has clicks on both
    // sides but never a view -> absent from both paths.
    val got = checkedFunnel(Seq(
      (1L, "view", 10), (1L, "click", 20), (1L, "purchase", 30),
      (1L, "view", 110), (1L, "click", 120), (1L, "purchase", 130),
      (2L, "click", 10), (2L, "click", 110)))
    assert(got(1L) == ((3, 10L * 60000000L, 10L * 60000000L)))
    assert(!got.contains(2L))
  }

  test("funnel: empty batch and empty standing are both identities") {
    val all = Seq((1L, "view", 10), (1L, "click", 20))
    checkedFunnel(all) // batch empty
    checkedFunnel(all.map { case (u, ty, m) => (u, ty, m + 100) }) // standing empty
  }

  // ---- ingest-contract guards (r14 VERDICT task 4): a violating
  // batch must fail loudly, and a straggler that CANNOT change the
  // recompute must still pass — the funnel guard is exact, not a
  // blanket time-order check.

  private def allMessages(t: Throwable): String =
    if (t == null) "" else t.getMessage + "\n" + allMessages(t.getCause)

  private def assertViolates(df: => org.apache.spark.sql.DataFrame, tag: String): Unit = {
    val ex = intercept[Throwable] { df.collect() }
    assert(allMessages(ex).contains("ingest-contract violation"),
      s"$tag must raise the contract guard, got: ${allMessages(ex).take(300)}")
  }

  test("guard: back-dated batch view under a set anchor raises") {
    val standing = queries.Analytic.funnelStates(
      events((1L, "view", 50), (1L, "click", 60)))
    assertViolates(queries.Analytic.mergeFunnelStates(
      standing, events((1L, "view", 10))), "view<t1")
  }

  test("guard: batch click that would move a set t2 raises; one past t2 passes") {
    val standing = queries.Analytic.funnelStates(
      events((1L, "view", 10), (1L, "click", 40)))
    assertViolates(queries.Analytic.mergeFunnelStates(
      standing, events((1L, "click", 20))), "t1<click<t2")
    // Straggler AFTER t2: min click over the union is still 40, so the
    // merge passes and equals the recompute (the guard is exact).
    val merged = funnelRows(queries.Analytic.mergeFunnelStates(
        standing, events((1L, "click", 70)))
      .select(col("user_id"),
        when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
          .otherwise(1).cast("int"),
        (unix_micros(col("t2")) - unix_micros(col("t1"))),
        (unix_micros(col("t3")) - unix_micros(col("t2")))))
    assert(merged(1L) == ((2, 30L * 60000000L, null)))
  }

  test("guard: batch purchase that would move a set t3 raises") {
    val standing = queries.Analytic.funnelStates(
      events((1L, "view", 10), (1L, "click", 20), (1L, "purchase", 60)))
    assertViolates(queries.Analytic.mergeFunnelStates(
      standing, events((1L, "purchase", 30))), "t2<purchase<t3")
  }

  test("guard: retention batch overlapping a standing activity day raises") {
    // Existing user active on day 0 in standing; a batch row on the
    // SAME day would double-count cell (d0, 0) — the silent wrong
    // answer the day-disjoint guard exists for.
    val (f, cells) = queries.Analytic.retentionState(events((1L, "view", 10)))
    val (_, merged) = queries.Analytic.mergeRetention(f, cells, events((1L, "click", 20)))
    assertViolates(merged, "same-day retention batch")
    // A batch on a LATER day passes (the existing crafted cases).
    val (_, ok) = queries.Analytic.mergeRetention(f, cells, events((1L, "view", 1500)))
    assert(ok.count() == 2)
  }

  private def retRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq

  /** Merge path vs q114-style full recompute, through the registered
    * presentation. */
  private def checkedRetention(all: Seq[(Long, String, Int)]): Seq[Seq[Any]] = {
    val e = events(all: _*)
    val cut = lit(new Timestamp(1700000000000L + CutMin * 60000L))
    val (f, cells) = queries.Analytic.retentionState(e.where(col("ts") < cut))
    val (_, merged) = queries.Analytic.mergeRetention(f, cells, e.where(col("ts") >= cut))
    val (_, full) = queries.Analytic.retentionState(e)
    def render(c: org.apache.spark.sql.DataFrame) = retRows {
      val sz = c.where(col("day_offset") === 0)
        .select(col("cohort_day"), col("n_users").as("cohort_size"))
      c.join(sz, "cohort_day")
        .select(col("cohort_day"), col("day_offset").cast("int").as("day_offset"),
          col("n_users"),
          round(col("n_users").cast("double") / col("cohort_size"), 4).as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }
    val (got, want) = (render(merged), render(full))
    assert(got == want, "retention merge must equal the full recompute")
    got
  }

  // Day boundary in fixture minutes: CutMin = 100 min ≈ day 0 of the
  // epoch; use multi-day offsets (1440 min/day) so days differ. The
  // contract needs a DAY-aligned cutoff; 1700000000000L is 02:13 UTC,
  // so minute 100+ stays inside day 0 — standing days ⊆ {day0}, batch
  // days ∈ {day0...}? No: a day shared across the boundary would break
  // pair disjointness. Keep standing strictly in day 0 (minutes < 100)
  // and batch strictly in later days (minutes >= 1440).
  test("retention: old cohort activity lands in new cells; new cohort opens in batch") {
    val got = checkedRetention(Seq(
      (1L, "view", 10),              // u1 cohort day 0
      (2L, "view", 20),              // u2 cohort day 0
      (1L, "view", 1500),            // u1 active day 1 -> cell (d0, 1)
      (3L, "view", 1500),            // u3 NEW cohort day 1
      (3L, "view", 2900),            // u3 active day 2 -> cell (d1, 1)
      (1L, "view", 2900)))           // u1 active day 2 -> cell (d0, 2)
    // spot-check shape: two cohorts, day-0 cells are full-size.
    val byCohort = got.groupBy(_.head)
    assert(byCohort.size == 2)
  }

  test("retention: duplicate same-day activity collapses to one pair") {
    checkedRetention(Seq(
      (1L, "view", 10), (1L, "click", 20),         // same standing day
      (1L, "view", 1500), (1L, "click", 1501),     // same batch day, twice
      (2L, "view", 1500), (2L, "view", 1502)))     // new user, dup day
  }

  test("two sequential batches converge to the full recompute (sf0.001)") {
    // The merged state must itself be a valid STANDING state for the
    // next merge — the property the daily-batch deployment rests on
    // (FunnelVolBench/RetentionVolBench prove it at 28.7M events;
    // this is the sf pin). Split Jan at the 8th and the 15th.
    val dir = "/root/testdata/sf0.001"
    val e = queries.t(spark, dir, "events")
    val c1 = lit("2024-01-08").cast("timestamp")
    val c2 = lit("2024-01-15").cast("timestamp")
    val afterTwo = queries.Analytic.mergeFunnelStates(
      queries.Analytic.mergeFunnelStates(
        queries.Analytic.funnelStates(e.where(col("ts") < c1)),
        e.where(col("ts") >= c1 && col("ts") < c2)),
      e.where(col("ts") >= c2))
    val full = queries.Analytic.funnelStates(e)
    def render(st: org.apache.spark.sql.DataFrame) =
      st.collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getTimestamp(1),
          if (r.isNullAt(2)) null else r.getTimestamp(2),
          if (r.isNullAt(3)) null else r.getTimestamp(3)))).toMap
    assert(render(afterTwo) == render(full))
    // Retention twin: fold the same two windows into the cells.
    val (f0, cl0) = queries.Analytic.retentionState(e.where(col("ts") < c1))
    val (f1, cl1) = queries.Analytic.mergeRetention(f0, cl0,
      e.where(col("ts") >= c1 && col("ts") < c2))
    val (_, cl2) = queries.Analytic.mergeRetention(f1, cl1, e.where(col("ts") >= c2))
    val (_, clFull) = queries.Analytic.retentionState(e)
    def cells(c: org.apache.spark.sql.DataFrame) =
      c.collect().map(r => (r.get(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(cells(cl2) == cells(clFull))
  }

  test("funnel fold is redelivery-idempotent: re-folding already-folded events is a no-op (r16 VERDICT task 5)") {
    // The claimed split: the funnel needs no q133 front-end because
    // every anchor is a min over events strictly later than the
    // previous anchor, and every guard compares with <, not <= — a
    // redelivered copy can only reproduce the min it set. Standing
    // anchors from BOTH eras: u1's view in standing, click/purchase in
    // the first batch; u2 entirely in the first batch.
    val all = Seq[(Long, String, Int)](
      (1L, "view", 10),
      (1L, "click", 110), (1L, "purchase", 120),
      (2L, "view", 105), (2L, "click", 115))
    val e = events(all: _*)
    val cut = lit(new Timestamp(1700000000000L + CutMin * 60000L))
    val st1 = queries.Analytic.mergeFunnelStates(
      queries.Analytic.funnelStates(e.where(col("ts") < cut)),
      e.where(col("ts") >= cut))
    def render(st: org.apache.spark.sql.DataFrame) =
      st.collect().map(r => r.getLong(0) ->
        ((String.valueOf(r.get(1)), String.valueOf(r.get(2)),
          String.valueOf(r.get(3))))).toMap
    // Redeliver the ENTIRE already-folded batch (the checkpoint-replay
    // shape), plus a fresh event, into the post-fold state: the dupes
    // must change nothing and the fresh event must fold.
    val redelivered = e.where(col("ts") >= cut)
      .unionByName(events((2L, "purchase", 130)))
    val st2 = queries.Analytic.mergeFunnelStates(st1, redelivered)
    val want = queries.Analytic.funnelStates(
      e.unionByName(events((2L, "purchase", 130))))
    assert(render(st2) == render(want),
      "redelivered batch changed the funnel fold — idempotence broken")
    // And the pure-dupe fold is an exact no-op.
    assert(render(queries.Analytic.mergeFunnelStates(st1, e.where(col("ts") >= cut)))
      == render(st1))
  }

  test("retention fold raises loudly on cross-epoch redelivery; q142's front-end makes it proceed") {
    // Without the front-end the max-day guard REJECTS a replayed
    // batch (never a silent double-count); with dedupBatch the fold
    // proceeds and equals the recompute — q142's registered claim,
    // pinned here on a crafted epoch. event_ids are explicit so the
    // id store can recognize the redelivered rows.
    val s = spark
    import s.implicits._
    def evId(rows: (Long, Long, String, Int)*) =
      rows.map { case (id, u, ty, m) =>
        (id, u, ty, new Timestamp(1700000000000L + m * 60000L)) }
        .toDF("event_id", "user_id", "event_type", "ts")
    val standingE = evId((1L, 1L, "view", 0), (2L, 2L, "view", 30))
    val freshE = evId((3L, 1L, "view", 1540), (4L, 3L, "view", 1550))
    // Dirty batch: both fresh rows, a redelivery of standing id 2,
    // and a second copy of fresh id 3.
    val dirty = freshE.unionByName(evId((2L, 2L, "view", 30), (3L, 1L, "view", 1540)))
    val (f, cells) = queries.Analytic.retentionState(standingE)
    val ex = intercept[Exception] {
      queries.Analytic.mergeRetention(f, cells, dirty)._2.collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("q120 ingest-contract violation"),
      s"guard must surface on the replayed day, got: ${msgs(ex).take(300)}")
    val deduped = queries.Analytic.dedupBatch(dirty,
      standingE.select(col("event_id")))
    val (_, merged) = queries.Analytic.mergeRetention(f, cells, deduped)
    def cellsOf(c: org.apache.spark.sql.DataFrame) =
      c.collect().map(r => (r.get(0).toString, r.get(1).toString) -> r.getLong(2)).toMap
    val (_, full) = queries.Analytic.retentionState(standingE.unionByName(freshE))
    assert(cellsOf(merged) == cellsOf(full),
      "front-ended fold != duplicate-free recompute")
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q142 under redelivery == q120 == q114, both dupe classes non-vacuous") {
      val dir = s"/root/testdata/$sf"
      val got = Registry.queriesMap("q142_retention_merge_redelivery")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val clean = Registry.queriesMap("q120_retention_merge")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got == clean, s"redelivery changed the retention fold at $dir")
      val e = queries.t(spark, dir, "events")
      val cut = lit(queries.Analytic.AnalyticCutoff).cast("timestamp")
      val redel = e.where(queries.Analytic.redelivered)
      assert(redel.where(col("ts") < cut).count() > 0,
        "no cross-epoch redelivery at this sf — the store probe is untested")
      assert(redel.where(col("ts") >= cut).count() > 0,
        "no in-batch duplicate at this sf — the batch dedup is untested")
      graft.Scratch.releaseAll()
    }
  }

  // Real-data replays: the registered q119/q120 must equal the
  // registered q113/q114 row-for-row (same presentation, same corpus,
  // merge vs full recompute).
  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q119 == q113 and q120 == q114, splits non-degenerate") {
      val dir = s"/root/testdata/$sf"
      val funnelInc = Registry.queriesMap("q119_funnel_merge")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val funnelFull = Registry.queriesMap("q113_funnel")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(funnelInc == funnelFull)
      val retInc = Registry.queriesMap("q120_retention_merge")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val retFull = Registry.queriesMap("q114_retention")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(retInc == retFull)
      // Non-vacuity: both windows hold events, and the batch actually
      // advances someone's funnel (a reached_step the standing state
      // alone would not report).
      val e = queries.t(spark, dir, "events")
      val cut = lit(queries.Analytic.AnalyticCutoff).cast("timestamp")
      val nOld = e.where(col("ts") < cut).count()
      val nNew = e.where(col("ts") >= cut).count()
      assert(nOld > 0 && nNew > 0, s"degenerate split: $nOld/$nNew")
      val standingOnly = queries.Analytic.funnelStates(e.where(col("ts") < cut))
      val advanced = queries.Analytic.mergeFunnelStates(
          standingOnly, e.where(col("ts") >= cut))
        .join(standingOnly.select(col("user_id"),
            col("t2").as("o2"), col("t3").as("o3")), Seq("user_id"), "left")
        .where((col("t2").isNotNull && col("o2").isNull) ||
               (col("t3").isNotNull && col("o3").isNull))
        .count()
      assert(advanced > 0, "no user advanced across the boundary; replay vacuous")
    }
  }
}
