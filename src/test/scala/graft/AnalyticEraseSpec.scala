package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q125/q126's erasure-equals-recompute contracts — the remove half of
  * the behavioral standing artifacts (q119/q120 are the add half).
  * Crafted cases pin the branches a replay can't isolate: a cell
  * decrementing vs dropping to zero, a full cohort leaving the matrix,
  * an unknown user's erasure as a no-op, and the input-contract guard
  * firing on a foreign activity relation. The sf replays then pin
  * erasure == full recompute over the survivors on the real event
  * tables — the identity the registered oracles re-prove cross-engine
  * every round. */
class AnalyticEraseSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** events(user_id, event_type, ts) from (user, type, minutes) rows —
    * the AnalyticMergeSpec fixture (1440 min/day for day offsets). */
  private def events(rows: (Long, String, Int)*) = {
    val s = spark
    import s.implicits._
    rows.map { case (u, ty, m) =>
      (u, ty, new Timestamp(1700000000000L + m * 60000L)) }
      .toDF("user_id", "event_type", "ts")
  }

  private def activityOf(e: org.apache.spark.sql.DataFrame, users: Long*) = {
    val s = spark
    import s.implicits._
    e.join(users.toDF("user_id"), Seq("user_id"), "left_semi")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
  }

  private def cellMap(c: org.apache.spark.sql.DataFrame): Map[(String, Int), Long] =
    c.collect().map(r => (r.get(0).toString, r.get(1).toString.toInt) -> r.getLong(2)).toMap

  test("retention erase: decrement, zero-cell drop, full-cohort drop, survivors untouched") {
    // u1: active day 0 and day 1 (cohort d0); u2: day 0 only (cohort
    // d0); u3: day 1 only (cohort d1).
    val e = events(
      (1L, "view", 10), (1L, "view", 1500),
      (2L, "view", 20), (3L, "view", 1500))
    val (f, cells) = queries.Analytic.retentionState(e)
    assert(cellMap(cells.select(col("cohort_day"), col("day_offset"), col("n_users")))
      .values.sum == 4)
    // Erase u1: (d0,0) decrements 2->1, (d0,1) drops to zero, (d1,0)
    // untouched — exactly the recompute over u2+u3.
    val (f1, after1) = queries.Analytic.eraseRetention(f, cells, activityOf(e, 1L))
    val (_, want1) = queries.Analytic.retentionState(
      e.where(col("user_id") =!= 1L))
    assert(cellMap(after1) == cellMap(want1))
    assert(!cellMap(after1).keySet.exists(_._2 == 1), "zero cell must drop")
    assert(f1.count() == 2)
    // Erase u3 as well: cohort d1 leaves the matrix entirely.
    val (_, after2) = queries.Analytic.eraseRetention(f1, after1, activityOf(e, 3L))
    val (_, want2) = queries.Analytic.retentionState(
      e.where(col("user_id") === 2L))
    assert(cellMap(after2) == cellMap(want2))
    assert(cellMap(after2).keySet.map(_._1).size == 1, "cohort d1 must be gone")
  }

  test("retention erase: unknown user is a no-op; foreign activity raises the guard") {
    val e = events((1L, "view", 10), (2L, "view", 20))
    val (f, cells) = queries.Analytic.retentionState(e)
    // u99 has no standing rows: nothing joins, nothing decrements.
    val s = spark
    import s.implicits._
    val ghost = Seq((99L, java.sql.Date.valueOf("2023-11-14")))
      .toDF("user_id", "day")
    val (fG, afterG) = queries.Analytic.eraseRetention(f, cells, ghost)
    assert(cellMap(afterG) == cellMap(cells) && fG.count() == 2)
    // A day u1 was never active on names a cell the standing table
    // lacks -> the input-contract guard must fail loudly.
    val foreign = activityOf(e, 1L)
      .union(Seq((1L, java.sql.Date.valueOf("2023-11-20"))).toDF("user_id", "day"))
    val ex = intercept[Throwable] {
      queries.Analytic.eraseRetention(f, cells, foreign)._2.collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("erasure-input violation"))
  }

  test("funnel erase: row delete == recompute over survivors") {
    val e = events(
      (1L, "view", 10), (1L, "click", 20), (1L, "purchase", 30),
      (2L, "view", 15), (2L, "click", 40))
    val s = spark
    import s.implicits._
    val erased = queries.Analytic.eraseFunnelUsers(
      queries.Analytic.funnelStates(e), Seq(1L).toDF("user_id"))
    val want = queries.Analytic.funnelStates(e.where(col("user_id") =!= 1L))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(m(erased) == m(want))
    assert(m(erased).keySet == Set(2L))
  }

  // Real-data replays: the registered q125/q126 must equal the q114/
  // q113 presentations recomputed over the surviving users — the same
  // identity the DuckDB oracles re-prove cross-engine every round.
  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q125/q126 == survivor recompute, erasure non-vacuous") {
      val dir = s"/root/testdata/$sf"
      val e = queries.t(spark, dir, "events")
      val surv = e.where(!queries.Analytic.erasedUsers)
      val nErased = e.where(queries.Analytic.erasedUsers)
        .select(col("user_id")).distinct().count()
      val nSurv = surv.select(col("user_id")).distinct().count()
      assert(nErased > 0 && nSurv > 0, s"degenerate erasure split: $nErased/$nSurv")
      // q125 vs q114-over-survivors, through the registered presentation.
      val (_, cells) = queries.Analytic.retentionState(surv)
      val sz = cells.where(col("day_offset") === 0)
        .select(col("cohort_day"), col("n_users").as("cohort_size"))
      val wantRet = cells.join(sz, "cohort_day")
        .select(col("cohort_day"), col("day_offset").cast("int").as("day_offset"),
          col("n_users"),
          round(col("n_users").cast("double") / col("cohort_size"), 4).as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
        .collect().map(_.toSeq).toSeq
      val gotRet = Registry.queriesMap("q125_retention_erase")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(gotRet == wantRet)
      // q126 vs q113-over-survivors.
      val st = queries.Analytic.funnelStates(surv)
      val wantFun = st.select(col("user_id"),
          when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
            .otherwise(1).cast("int").as("reached_step"),
          (unix_micros(col("t2")) - unix_micros(col("t1"))).as("v2c_micros"),
          (unix_micros(col("t3")) - unix_micros(col("t2"))).as("c2p_micros"))
        .orderBy(col("user_id"))
        .collect().map(_.toSeq).toSeq
      val gotFun = Registry.queriesMap("q126_funnel_erase")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(gotFun == wantFun)
      // The erasure must actually change both artifacts at this sf.
      val fullRet = Registry.queriesMap("q114_retention")(spark, dir).collect().toSeq
      assert(gotRet.size < fullRet.size ||
        gotRet != fullRet.map(_.toSeq),
        "q125 output identical to q114 — erased users had no activity")
      val fullFun = Registry.queriesMap("q113_funnel")(spark, dir).count()
      assert(gotFun.size < fullFun, "q126 erased nobody with a funnel row")
    }
  }

  // ---- q137: partial erasure at per-user T (the cohort-move shape).

  test("q137 crafted: cohort move, vanish, straddle day, same-cohort rejoin") {
    val s = spark
    import s.implicits._
    // Minutes: day boundaries at 1440. Per-user T (minutes):
    //   u1 T=2000 (mid day 1): active d0, d1(pre+post T!), d2 ->
    //      cohort MOVES d0->d1; d1 survives (post-T event on it).
    //   u2 T=2000: active d0 only -> vanishes.
    //   u3 T=1000 (mid day 0): active d0 post-T only at minute 1200 ->
    //      re-cohorts at d0, i.e. SAME cohort day (full-remove then
    //      identical re-add must be a net no-op).
    //   u4: no request; active d0, d2 — untouched.
    val e = events(
      (1L, "view", 10), (1L, "view", 1500), (1L, "view", 2100), (1L, "view", 3000),
      (2L, "view", 20),
      (3L, "view", 1200),
      (4L, "view", 30), (4L, "view", 3100))
    val (f, cells) = queries.Analytic.retentionState(e)
    val requests = Seq(
      (1L, 1700000000000000L + 2000L * 60000000L),
      (2L, 1700000000000000L + 2000L * 60000000L),
      (3L, 1700000000000000L + 1000L * 60000000L)).toDF("user_id", "req_us")
    val fullActivity = activityOf(e, 1L, 2L, 3L)
    val postT = e.join(requests, "user_id")
      .where(unix_micros(col("ts")) >= col("req_us"))
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val (f2, after) = queries.Analytic.eraseRetentionBeforeT(
      f, cells, fullActivity, postT)
    // Filtered recompute: u1 keeps d1 (post-T event at 2100), d2; u2
    // gone; u3 keeps d0; u4 untouched.
    val filtered = e.join(requests, Seq("user_id"), "left")
      .where(col("req_us").isNull || unix_micros(col("ts")) >= col("req_us"))
      .select(col("user_id"), col("event_type"), col("ts"))
    val (wantF, wantC) = queries.Analytic.retentionState(filtered)
    assert(cellMap(after) == cellMap(wantC),
      s"cells != filtered recompute: ${cellMap(after)} vs ${cellMap(wantC)}")
    val fMap = f2.collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
    val wantFMap = wantF.collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
    assert(fMap == wantFMap, s"first-seen != filtered recompute: $fMap vs $wantFMap")
    // The moves themselves, explicitly:
    assert(fMap(1L) != f.collect().find(_.getLong(0) == 1L).get.get(1).toString,
      "u1's cohort day must MOVE")
    assert(!fMap.contains(2L), "u2 must vanish")
    assert(fMap(3L) == f.collect().find(_.getLong(0) == 3L).get.get(1).toString,
      "u3 must re-cohort at the SAME day (net no-op)")
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q137 == per-user-T filtered recompute, cohorts moved") {
      val dir = s"/root/testdata/$sf"
      val e = queries.t(spark, dir, "events")
      val filtered = e.where(
        !(queries.h60(concat(lit("erase:"), col("user_id"))) % 10 === 0) ||
          unix_micros(col("ts")) >= queries.Analytic.reqInstantUs)
      val (_, cells) = queries.Analytic.retentionState(filtered)
      val sz = cells.where(col("day_offset") === 0)
        .select(col("cohort_day"), col("n_users").as("cohort_size"))
      val want = cells.join(sz, "cohort_day")
        .select(col("cohort_day"), col("day_offset").cast("int").as("day_offset"),
          col("n_users"),
          round(col("n_users").cast("double") / col("cohort_size"), 4).as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
        .collect().map(_.toSeq).toSeq
      val got = Registry.queriesMap("q137_retention_erase_before_t")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"q137 != filtered recompute at $dir")
      // Non-vacuity in both directions: differs from the full matrix
      // (erasure did something) AND from the whole-user erase (the
      // re-cohort half did something q125 doesn't do).
      val full = Registry.queriesMap("q114_retention")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got != full, s"q137 vacuous at $dir")
      val whole = Registry.queriesMap("q125_retention_erase")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got != whole,
        s"q137 == q125 at $dir — no erased user re-cohorted")
    }
  }
}
