package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytic

/** q131's session-table merge: every branch of the interval sweep
  * pinned on a crafted corpus — forward/backward extension, open,
  * two-session bridge, chain bridge across three standing sessions,
  * interior count increment — each equal to the event-level gap-split
  * recompute, plus the out-of-order composition property (a backfill
  * batch folded after a later batch still converges to the recompute,
  * the no-arrival-contract claim). Then the sf pins: merge ==
  * recompute on the registered 7/8-standing / 1/8-batch split, with
  * the bridge branch firing non-vacuously at sf0.01. */
class SessionMergeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val MinMs = 60000L
  private def df(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.map { case (u, m) => (u, new Timestamp(m * MinMs)) }
      .toDF("user_id", "ts")
  }
  private def us(m: Long) = m * MinMs * 1000

  test("crafted branches: extend fwd/bwd, open, bridge, chain bridge, interior") {
    // Standing events per user (minutes); gap = 30 min.
    val standingEvents = Seq[(Long, Long)](
      (1, 0), (1, 10),            // u1: one session [0,10]
      (2, 100),                   // u2: one session [100,100]
      (3, 0),                     // u3: one session [0,0]
      (4, 0), (4, 10), (4, 50), (4, 60), // u4: [0,10], [50,60] (gap 40)
      (5, 0), (5, 5), (5, 60), (5, 65), (5, 120), (5, 125), // u5: three sessions
      (6, 0), (6, 10), (6, 20))   // u6: one session [0,20]
    val batchEvents = Seq[(Long, Long)](
      (1, 35),  // extend forward: 35-10=25 <= 30
      (2, 75),  // extend backward: 100-75=25 <= 30
      (3, 200), // open: far beyond reach
      (4, 30),  // bridge: 30-10=20 and 50-30=20
      (5, 30), (5, 90), // chain bridge: connects all three sessions
      (6, 15))  // interior: inside [0,20], count only
    val standing = Analytic.sessionTable(df(standingEvents))
    val got = Analytic.mergeSessions(standing, df(batchEvents))
      .orderBy(col("user_id"), col("start_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = Analytic.sessionTable(df(standingEvents ++ batchEvents))
      .orderBy(col("user_id"), col("start_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"merge != recompute:\n got=$got\nwant=$want")
    // Branch shapes, explicitly:
    assert(got.contains((1L, 3L, us(0), us(35))), "forward extension")
    assert(got.contains((2L, 2L, us(75), us(100))), "backward extension")
    assert(got.contains((3L, 1L, us(0), us(0))) &&
      got.contains((3L, 1L, us(200), us(200))), "open")
    assert(got.contains((4L, 5L, us(0), us(60))),
      "two standing sessions must bridge into one")
    assert(got.contains((5L, 8L, us(0), us(125))),
      "chain bridge must fuse all three standing sessions")
    assert(got.contains((6L, 4L, us(0), us(20))), "interior count increment")
  }

  test("merges compose out of order: a later batch then a backfill == recompute") {
    // u9's events split into standing + a LATER batch + a BACKFILL
    // that bridges only once both are folded — exactness must not
    // depend on fold order (the no-arrival-contract claim).
    val standingEvents = Seq[(Long, Long)]((9, 0), (9, 100))
    val later = Seq[(Long, Long)]((9, 160))     // beyond both (gap 60 > 30)
    // The backfill chain 25-55-85 reaches 100 (gap 15) and 130 reaches
    // both 100 and 160 — everything fuses only once BOTH folds ran.
    val backfill = Seq[(Long, Long)]((9, 25), (9, 55), (9, 85), (9, 130))
    val s0 = Analytic.sessionTable(df(standingEvents))
    val s1 = Analytic.mergeSessions(s0, df(later))
    val s2 = Analytic.mergeSessions(s1, df(backfill))
      .orderBy(col("user_id"), col("start_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = Analytic.sessionTable(df(standingEvents ++ later ++ backfill))
      .orderBy(col("user_id"), col("start_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(s2 == want, s"out-of-order composition broke: $s2 vs $want")
    assert(s2 == Seq((9L, 7L, us(0), us(160))), "backfill must fuse everything")
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: registered q131 == full gap-split recompute") {
      val dir = s"/root/testdata/$sf"
      val got = Registry.queriesMap("q131_session_table_merge")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val want = Analytic.sessionTable(queries.t(spark, dir, "events"))
        .orderBy(col("user_id"), col("start_us"))
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"q131 != recompute at $dir")
      assert(got.nonEmpty)
    }
  }

  test("q133 dedup: in-batch duplicates and already-folded redeliveries both drop") {
    import spark.implicits._
    // Standing: u1 events (ids 1,2) -> one session [0,10]. Batch: a
    // fresh event (id 3, t=35), a REDELIVERY of standing id 1, and id
    // 3 delivered twice. Only the fresh event may fold.
    def edf(rows: Seq[(Long, Long, Long)]) =
      rows.map { case (id, u, m) => (id, u, new Timestamp(m * MinMs)) }
        .toDF("event_id", "user_id", "ts")
    val standingEvents = edf(Seq((1L, 1L, 0L), (2L, 1L, 10L)))
    val standing = Analytic.sessionTable(standingEvents)
    val ids = standingEvents.select(col("event_id"))
    val batch = edf(Seq((3L, 1L, 35L), (1L, 1L, 0L), (3L, 1L, 35L)))
    val deduped = Analytic.dedupBatch(batch, ids)
    assert(deduped.select(col("event_id")).collect().map(_.getLong(0)).toSeq == Seq(3L),
      "dedup must keep exactly the fresh event")
    val got = Analytic.mergeSessions(standing, deduped)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 3L, us(0), us(35))),
      s"redelivered rows leaked into the fold: $got")
  }

  test("q133 size gate: broadcast and shuffle dedup branches are identical (r16 VERDICT)") {
    val dir = "/root/testdata/sf0.001"
    val e = queries.t(spark, dir, "events")
    val standingEvents = e.where(!Analytic.sessBatchEvents)
    val ids = standingEvents.select(col("event_id"))
    val batch = e.where(Analytic.sessBatchEvents)
      .unionByName(e.where(Analytic.redelivered))
    def run(cap: Long) =
      Analytic.dedupBatchGated(batch, ids, cap)
        .orderBy(col("event_id")).collect().map(_.toSeq).toSeq
    val viaBroadcast = run(Long.MaxValue) // forces the broadcast probe
    val viaShuffle = run(0L)              // forces the shuffle anti-join
    assert(viaBroadcast == viaShuffle,
      "the size-gated branches must produce the identical deduped batch")
    assert(viaBroadcast.nonEmpty)
  }

  test("q147 aged store: a horizon-respecting batch dedups identically to the full store") {
    import spark.implicits._
    // Horizon at minute 100 (crafted epoch-1970 scale). Standing: u1
    // ids 1,2 BEFORE the horizon (aged out of the id store), id 3
    // after it. Batch: fresh id 4, a redelivery of post-horizon
    // standing id 3 (the aged store must still catch it), and id 4
    // twice (in-batch class). Only id 4 may fold — same answer the
    // FULL store gives.
    val hor = "1970-01-01 01:40:00"
    def edf(rows: Seq[(Long, Long, Long)]) =
      rows.map { case (id, u, m) => (id, u, new Timestamp(m * MinMs)) }
        .toDF("event_id", "user_id", "ts")
    val standingEvents = edf(Seq((1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 200L)))
    val standing = Analytic.sessionTable(standingEvents)
    val agedIds = standingEvents
      .where(col("ts") >= lit(hor).cast("timestamp"))
      .select(col("event_id"))
    val batch = edf(Seq((4L, 1L, 220L), (3L, 1L, 200L), (4L, 1L, 220L)))
    val aged = Analytic.dedupBatchAged(batch, agedIds, hor)
    assert(aged.select(col("event_id")).collect().map(_.getLong(0)).toSeq == Seq(4L),
      "aged-store dedup must keep exactly the fresh event")
    val full = Analytic.dedupBatch(batch, standingEvents.select(col("event_id")))
      .select(col("event_id")).collect().map(_.getLong(0)).toSeq
    assert(full == Seq(4L), "full-store dedup must agree on this batch")
    val got = Analytic.mergeSessions(standing, aged)
      .orderBy(col("start_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = Analytic.sessionTable(
        standingEvents.unionByName(edf(Seq((4L, 1L, 220L))))
          .select(col("user_id"), col("ts")))
      .orderBy(col("start_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"aged fold != recompute: $got vs $want")
  }

  test("q147 guard: a pre-horizon batch row raises loudly instead of risking a silent double-fold") {
    import spark.implicits._
    val hor = "1970-01-01 01:40:00"
    def edf(rows: Seq[(Long, Long, Long)]) =
      rows.map { case (id, u, m) => (id, u, new Timestamp(m * MinMs)) }
        .toDF("event_id", "user_id", "ts")
    val agedIds = edf(Seq((3L, 1L, 200L))).select(col("event_id"))
    // id 5 at minute 50 predates the horizon: it might be an aged-out
    // redelivery of an id the store no longer holds — refuse it.
    val batch = edf(Seq((4L, 1L, 220L), (5L, 1L, 50L)))
    val ex = intercept[Exception] {
      Analytic.dedupBatchAged(batch, agedIds, hor).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("q147 redelivery-horizon violation"),
      s"guard must surface, got: ${msgs(ex).take(300)}")
    // r18 ADVICE: the guard must also fire when every violating row
    // would have been ELIMINATED by the dedup itself — a duplicated
    // pre-horizon row and a pre-horizon copy of a stored id. The old
    // ts-wrapped guard only raised when a surviving row's ts was
    // projected, so this feed passed silently; keying the guard on
    // event_id (which the dedup must evaluate per row) enforces the
    // stated "raises on ANY pre-horizon batch row" contract.
    val dupBatch = edf(Seq(
      (4L, 1L, 220L),
      (5L, 1L, 50L), (5L, 1L, 50L), // in-batch duplicate violator
      (3L, 1L, 50L)))               // violator that the store anti-join eats
    val ex2 = intercept[Exception] {
      Analytic.dedupBatchAged(dupBatch, agedIds, hor).collect()
    }
    assert(msgs(ex2).contains("q147 redelivery-horizon violation"),
      s"guard must fire for duplicate-eliminated violators, got: ${msgs(ex2).take(300)}")
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q147's aged classes are non-vacuous (ids aged out; post-horizon standing redeliveries caught)") {
      val dir = s"/root/testdata/$sf"
      val e = queries.t(spark, dir, "events")
      val hcut = lit(Analytic.RedeliveryHorizon).cast("timestamp")
      // The aging must actually shrink the store...
      assert(e.where(!Analytic.sessBatchEvents && col("ts") < hcut).count() > 0,
        "no standing id ages out — the bounded-store claim is vacuous")
      // ...while the batch still carries redeliveries of POST-horizon
      // standing events (the class the aged store must catch)...
      assert(e.where(Analytic.redelivered && !Analytic.sessBatchEvents &&
          col("ts") >= hcut).count() > 0,
        "no post-horizon standing redelivery — the aged probe is untested")
      // ...and redeliveries the horizon EXCLUDES exist (the class the
      // guard protects against).
      assert(e.where(Analytic.redelivered && col("ts") < hcut).count() > 0,
        "no pre-horizon redelivery exists — the guard protects nothing")
    }
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q133 under ~25% redelivery == q131 == recompute, pressure non-vacuous") {
      val dir = s"/root/testdata/$sf"
      val got = Registry.queriesMap("q133_session_merge_redelivery")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val clean = Registry.queriesMap("q131_session_table_merge")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got == clean, s"redelivery changed the fold at $dir")
      // Non-vacuity: the redelivered set must hit BOTH duplicate
      // classes — already-folded standing events and batch events.
      val e = queries.t(spark, dir, "events")
      val redel = e.where(Analytic.redelivered)
      assert(redel.where(!Analytic.sessBatchEvents).count() > 0,
        "no standing event redelivered — the store probe is untested")
      assert(redel.where(Analytic.sessBatchEvents).count() > 0,
        "no batch event duplicated — the in-batch dedup is untested")
    }
  }

  test("q136 crafted: partial erasure splits a straddling session at the first post-T event") {
    import spark.implicits._
    // u1 (requested, T=100): sessions [0,10], [90,110] (straddles T),
    // [200,210]. The rebuild from post-T events must drop [0,10],
    // SPLIT [90,110] into its post-T remainder [110,110], and keep
    // [200,210]. u2 (no request): bit-identical passthrough.
    val events = df(Seq[(Long, Long)](
      (1, 0), (1, 10), (1, 90), (1, 110), (1, 200), (1, 210),
      (2, 0), (2, 5)))
    val standing = Analytic.sessionTable(events)
    val requests = Seq((1L, us(100))).toDF("user_id", "req_us")
    val got = Analytic.eraseSessionsBeforeT(standing, events, requests)
      .orderBy(col("user_id"), col("start_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 1L, us(110), us(110)), // the straddle's post-T remainder
      (1L, 2L, us(200), us(210)),
      (2L, 2L, us(0), us(5))), s"unexpected erased table: $got")
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q135 whole-user erase and q136 partial erase == filtered recomputes") {
      val dir = s"/root/testdata/$sf"
      val e = queries.t(spark, dir, "events")
      val erased = queries.h60(concat(lit("erase:"), col("user_id"))) % 10 === 0
      val got135 = Registry.queriesMap("q135_session_table_user_erase")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val want135 = Analytic.sessionTable(e.where(!erased))
        .orderBy(col("user_id"), col("start_us"))
        .collect().map(_.toSeq).toSeq
      assert(got135 == want135, s"q135 != survivor recompute at $dir")
      val got136 = Registry.queriesMap("q136_session_table_erase_before_t")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val want136 = Analytic.sessionTable(e.where(!erased ||
          unix_micros(col("ts")) >= Analytic.reqInstantUs))
        .orderBy(col("user_id"), col("start_us"))
        .collect().map(_.toSeq).toSeq
      assert(got136 == want136, s"q136 != per-user-T filtered recompute at $dir")
      // Non-vacuity: both erasures changed the table.
      val full = Analytic.sessionTable(e).orderBy(col("user_id"), col("start_us"))
        .collect().map(_.toSeq).toSeq
      assert(got135 != full && got136 != full, s"erasure vacuous at $dir")
    }
  }

  test("sf0.01: the registered split fires the bridge branch non-vacuously") {
    val dir = "/root/testdata/sf0.01"
    val e = queries.t(spark, dir, "events")
    val standing = Analytic.sessionTable(e.where(!Analytic.sessBatchEvents))
    val full = Analytic.sessionTable(e)
    // A bridge happened iff >= 2 standing sessions of one user land
    // inside one recomputed session (their starts fall in its span).
    val bridges = standing.as("s").join(full.as("f"),
        col("s.user_id") === col("f.user_id") &&
          col("s.start_us") >= col("f.start_us") &&
          col("s.start_us") <= col("f.end_us"))
      .groupBy(col("f.user_id"), col("f.start_us"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= 2).count()
    assert(bridges >= 1,
      "registered sf0.01 split fires no bridge — the branch is untested at sf")
  }
}
