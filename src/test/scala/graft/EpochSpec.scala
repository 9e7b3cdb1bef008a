package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytic

/** q140's unified maintenance epoch: the cross-family ORDERING hazard
  * pinned on a crafted epoch (the same user active in the epoch AND
  * erased with T inside it — fold-then-erase == the per-user-T
  * filtered recompute, erase-then-fold leaves the pre-T batch residue
  * the rebuild oracle rejects), the new funnel partial-erase half
  * pinned on crafted cascades, and the sf replays proving each of
  * q140's family slices equals the corresponding REGISTERED
  * per-family query (sessions == q136, retention == q137, clusters ==
  * q141) plus the funnel slice == the filtered batch recompute. */
class EpochSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val MinMs = 60000L
  private def ev(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.map { case (u, m) => (u, new Timestamp(m * MinMs)) }
      .toDF("user_id", "ts")
  }
  private def us(m: Long) = m * MinMs * 1000

  test("ordering hazard: fold-then-erase == filtered recompute; erase-then-fold leaves pre-T batch residue") {
    import spark.implicits._
    // Epoch boundary at minute 100. u1 is erased with T = minute 150,
    // INSIDE the epoch: standing events {0, 10}, batch events
    // {120 (pre-T), 200 (post-T)}. u2 (no request) spans the boundary
    // untouched: standing {90}, batch {110}.
    val standingEvents = ev(Seq((1L, 0L), (1L, 10L), (2L, 90L)))
    val batchEvents = ev(Seq((1L, 120L), (1L, 200L), (2L, 110L)))
    val allEvents = standingEvents.unionByName(batchEvents)
    val requests = Seq((1L, us(150))).toDF("user_id", "req_us")
    val standing = Analytic.sessionTable(standingEvents)
    val expected = Analytic.sessionTable(
      allEvents.join(requests, Seq("user_id"), "left")
        .where(col("req_us").isNull || unix_micros(col("ts")) >= col("req_us"))
        .select(col("user_id"), col("ts")))
      .collect().map(_.toSeq).toSet
    // The pinned order: fold the day, then erase at T.
    val foldThenErase = Analytic.eraseSessionsBeforeT(
        Analytic.mergeSessions(standing, batchEvents), allEvents, requests)
      .collect().map(_.toSeq).toSet
    assert(foldThenErase == expected,
      s"fold-then-erase must equal the filtered recompute: $foldThenErase vs $expected")
    assert(expected.contains(Seq(1L, 1L, us(200), us(200))),
      "u1's post-T event must survive as its own session")
    // The rejected order: erasing first leaves the pre-T batch event
    // (minute 120 < T) to fold back in afterwards — residue.
    val eraseThenFold = Analytic.mergeSessions(
        Analytic.eraseSessionsBeforeT(standing, standingEvents, requests),
        batchEvents)
      .collect().map(_.toSeq).toSet
    assert(eraseThenFold != expected,
      "erase-then-fold unexpectedly matched the filtered recompute — hazard vacuous")
    assert(eraseThenFold.exists { r =>
      r.head == 1L && r(2).asInstanceOf[Long] == us(120) },
      s"the residue must be u1's pre-T batch event re-admitted: $eraseThenFold")
  }

  test("funnel partial erase at T: touched cascades rebuilt from post-T events, untouched bit-identical") {
    import spark.implicits._
    def fev(rows: Seq[(Long, Long, String)]) =
      rows.map { case (u, m, t) => (u, new Timestamp(m * MinMs), t) }
        .toDF("user_id", "ts", "event_type")
    // u1 (T=100): full cascade pre-T {view 0, click 10, purchase 20},
    //   post-T {view 110, click 120} -> rebuilt state reaches step 2
    //   with the post-T anchors.
    // u2 (T=100): only pre-T activity -> state row vanishes.
    // u3 (no request): cascade must pass through bit-identical.
    val events = fev(Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (1L, 110L, "view"), (1L, 120L, "click"),
      (2L, 0L, "view"), (2L, 10L, "click"),
      (3L, 5L, "view"), (3L, 15L, "click")))
    val requests = Seq((1L, us(100)), (2L, us(100))).toDF("user_id", "req_us")
    val states = Analytic.funnelStates(events)
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)),
        String.valueOf(r.get(2)), String.valueOf(r.get(3))))
      .toSeq.sortBy(_._1)
    val got = norm(Analytic.eraseFunnelBeforeT(states, events, requests))
    val want = norm(Analytic.funnelStates(
      events.join(requests, Seq("user_id"), "left")
        .where(col("req_us").isNull || unix_micros(col("ts")) >= col("req_us"))
        .select(col("user_id"), col("ts"), col("event_type"))))
    assert(got == want, s"partial funnel erase != filtered recompute: $got vs $want")
    val gmap = got.map(r => r._1 -> r).toMap
    assert(gmap.contains(1L) && gmap(1L)._3 != "null" && gmap(1L)._4 == "null",
      s"u1 must reach step 2 on post-T anchors only: $got")
    assert(!gmap.contains(2L), "u2 (no post-T events) must vanish")
    assert(gmap.contains(3L), "u3 must pass through")
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q140's family slices == the registered per-family queries") {
      val dir = s"/root/testdata/$sf"
      val epoch = Registry.queriesMap("q140_maintenance_epoch")(spark, dir)
        .collect()
      def slice(f: String) =
        epoch.filter(_.getString(0) == f).map(_.toSeq.tail).toSeq
      // sessions == q136's registered output, reprojected.
      val q136 = Registry.queriesMap("q136_session_table_erase_before_t")(spark, dir)
        .select(col("user_id"), col("start_us"), col("n_events"), col("end_us"))
        .collect().map(_.toSeq).toSeq
      assert(slice("sessions").sortBy(_.toString) == q136.sortBy(_.toString),
        s"sessions slice != q136 at $dir")
      // retention == q137's registered output, reprojected (integer
      // cells only — the ratio column is derived).
      val q137 = Registry.queriesMap("q137_retention_erase_before_t")(spark, dir)
        .select(datediff(col("cohort_day"), lit("1970-01-01").cast("date"))
            .cast("long"),
          col("day_offset").cast("long"), col("n_users"),
          lit(null).cast("long"))
        .collect().map(_.toSeq).toSeq
      assert(slice("retention").sortBy(_.toString) == q137.sortBy(_.toString),
        s"retention slice != q137 at $dir")
      // clusters == q141's registered output, members hashed.
      val q141 = Registry.queriesMap("q141_capped_cluster_remove_range")(spark, dir)
        .select(col("canonical_id"), col("n_docs"),
          graft.queries.h60(col("members")), lit(null).cast("long"))
        .collect().map(_.toSeq).toSeq
      assert(slice("clusters").sortBy(_.toString) == q141.sortBy(_.toString),
        s"clusters slice != q141 at $dir")
      // funnel == the per-user-T filtered batch recompute (q130's
      // oracle relation, computed in-engine).
      val e = graft.queries.t(spark, dir, "events")
      val requests = e.where(Analytic.erasedUsers)
        .select(col("user_id")).distinct()
        .select(col("user_id"), Analytic.reqInstantUs.as("req_us"))
      val want = Analytic.funnelReport(Analytic.funnelStates(
          e.join(requests, Seq("user_id"), "left")
            .where(col("req_us").isNull ||
              unix_micros(col("ts")) >= col("req_us"))
            .select(col("user_id"), col("ts"), col("event_type"))))
        .select(col("user_id"), col("reached_step").cast("long"),
          col("v2c_micros"), col("c2p_micros"))
        .collect().map(_.toSeq).toSeq
      assert(slice("funnel").sortBy(_.toString) == want.sortBy(_.toString),
        s"funnel slice != filtered recompute at $dir")
      assert(slice("sessions").nonEmpty && slice("funnel").nonEmpty &&
        slice("retention").nonEmpty && slice("clusters").nonEmpty)
      graft.Scratch.releaseAll()
    }
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: q144's family slices == the registered per-family merges") {
      import graft.queries.h60
      val dir = s"/root/testdata/$sf"
      val epoch = Registry.queriesMap("q144_ingest_epoch")(spark, dir).collect()
      def slice(f: String) =
        epoch.filter(_.getString(0) == f).map(_.toSeq.tail).toSeq
          .sortBy(_.toString)
      def reprojIdx(name: String) =
        Registry.queriesMap(name)(spark, dir)
          .select(col("band").cast("long"), h60(col("key").cast("string")),
            col("n_kept"),
            h60(concat(col("dropped").cast("string"), lit(":"), col("ids"))))
          .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(slice("text_index") == reprojIdx("q101_index_merge"),
        s"text_index slice != q101 at $dir")
      assert(slice("embedding_index") == reprojIdx("q102_embedding_index_merge"),
        s"embedding_index slice != q102 at $dir")
      val q105 = Registry.queriesMap("q105_cluster_merge")(spark, dir)
        .select(col("canonical_id"), col("n_docs"), col("n_incoming"),
          h60(col("members")))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(slice("clusters") == q105, s"clusters slice != q105 at $dir")
      assert(slice("text_index").nonEmpty && slice("embedding_index").nonEmpty &&
        slice("clusters").nonEmpty)
      graft.Scratch.releaseAll()
    }
  }
}
