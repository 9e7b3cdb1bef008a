package graft.queries

import graft.Q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The UNIFIED MAINTENANCE EPOCH — the deployment shape the per-family
  * operators compose into (r16 VERDICT task 1). A warehouse schedules
  * ONE nightly job: fold the day's events into every behavioral
  * standing artifact (sessions, funnel, retention), apply the day's
  * privacy feed (per-user-instant erasures) against the post-fold
  * state, and run the day's takedown through the capped
  * index/clusters — sharing the batch scan and the request broadcast
  * across families instead of re-deriving them per job.
  *
  * Every half is an already-registered, individually-proven operator
  * (q131's interval fold, q119/q120's guarded merges, q136/q137's
  * per-user-T erasures, q141's range takedown); what q140 adds — and
  * what no per-family gate can witness — is their COMPOSITION in one
  * dataflow, including the cross-family ORDERING decision it forces:
  *
  * FOLD-THEN-ERASE. A user can be active in the epoch AND erased with
  * a T inside it. The epoch folds the full day first and applies the
  * erasure against the post-fold artifacts, so a pre-T batch event is
  * folded and then erased — equal to the per-user-T filtered
  * recompute. The other order is WRONG: erase-then-fold re-admits the
  * pre-T batch rows after the erasure already ran (nothing erases
  * them again), leaving residue the rebuild oracle rejects.
  * EpochSpec pins both facts on a crafted epoch (fold-then-erase ==
  * filtered recompute; erase-then-fold =!= it, with the residue row
  * identified).
  *
  * The oracle is LITERALLY the composition of the families' existing
  * rebuild oracles — q136 (sessions), q130 (funnel: the per-user-T
  * filtered cascade), q137 (retention), q141 (clusters) — each
  * embedded as a subquery and projected onto one tagged relation, so
  * the driver's hash gate re-proves every family's post-epoch state
  * == its from-scratch rebuild cross-engine every round.
  *
  * Scale shape: the day's batch is scanned ONCE (cached, three folds
  * consume it), the request relation is built once and broadcast to
  * every erase (batch-bounded, the q125 removal-set shape), each
  * fold/erase keeps its own proven exchange bounds (nothing here adds
  * a corpus-sized shuffle), and the takedown reads the partitioned
  * signature store with the q141 pid prune. */
object EpochOps {

  /** The epoch's standing artifacts — every family's state as of the
    * epoch boundary ([[Analytic.AnalyticCutoff]]): the session table,
    * funnel states, retention (first-seen, cells), and the capped
    * dedup artifacts with the partitioned signature store (at
    * [[DedupOps.Q141Cap]], the registered takedown's cap). */
  private def q140Arts(s: org.apache.spark.sql.SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame,
         (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, Long)) = {
    // Every behavioral artifact is a persisted store (r16 VERDICT
    // task 4): user-bucketed where the epoch body joins on user_id
    // (the funnel/retention standing sides contribute zero exchange),
    // sharing tags with the per-family queries' prepares so one
    // layout serves the whole registry.
    def pre = t(s, dir, "events")
      .where(col("ts") < lit(Analytic.AnalyticCutoff).cast("timestamp"))
    val sessSt = bucketedStore(s, dir, "sess_cut", "user_id")(
      Analytic.sessionTable(pre))
    val funSt = bucketedStore(s, dir, "funstates_pre", "user_id")(
      Analytic.funnelStates(pre))
    val retF = bucketedStore(s, dir, "retfirst_pre", "user_id")(
      Analytic.retentionState(pre)._1)
    val retC = plainStore(s, dir, "retcells_pre")(
      Analytic.retentionState(pre)._2)
    (sessSt, funSt, retF, retC, DedupOps.q124Arts(s, dir, DedupOps.Q141Cap))
  }

  val q140 = Q(
    "q140_maintenance_epoch",
    "unified maintenance epoch: one dataflow folds the day's batch into sessions/funnel/retention, applies the privacy feed at per-user T (fold-then-erase), and runs the range takedown — every family == its rebuild oracle",
    (s, dir) => {
      val e = t(s, dir, "events")
      val cut = lit(Analytic.AnalyticCutoff).cast("timestamp")
      val (sessSt, funSt, retF, retC,
        (sig, banded, idx, pairs, standing, pidSize)) =
        prepTake(s, dir, "prep140")(q140Arts(s, dir))
      // ONE batch scan (cached; all three folds consume it) and ONE
      // privacy feed (batch-bounded; broadcast into every erase).
      val batch = graft.Scratch.scoped(e.where(col("ts") >= cut))
      val requests = graft.Scratch.scoped(
        e.where(Analytic.erasedUsers).select(col("user_id")).distinct()
          .select(col("user_id"), Analytic.reqInstantUs.as("req_us")))
      // FOLD the day first...
      val sess1 = Analytic.mergeSessions(sessSt, batch)
      val fun1 = Analytic.mergeFunnelStates(funSt, batch)
      val (retF1, retC1) = Analytic.mergeRetention(retF, retC, batch)
      // ...THEN ERASE against the post-fold artifacts (the pinned
      // order — see the object scaladoc and EpochSpec).
      val sess2 = Analytic.eraseSessionsBeforeT(sess1, e, requests)
      val fun2 = Analytic.eraseFunnelBeforeT(fun1, e, requests)
      val fullAct = e
        .join(broadcast(requests.select(col("user_id"))),
          Seq("user_id"), "left_semi")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val postT = e.join(broadcast(requests), Seq("user_id"))
        .where(unix_micros(col("ts")) >= col("req_us"))
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val (_, retC2) =
        Analytic.eraseRetentionBeforeT(retF1, retC1, fullAct, postT)
      // The day's TAKEDOWN through the capped artifacts (q141's range
      // batch; the store scan prunes to the range's partitions).
      val (lo, hi) = DedupOps.q141Range(s, dir)
      val removedDocs = t(s, dir, "documents")
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .select(col("doc_id"))
      val clusters = DedupOps.removeFromCappedCluster(idx, banded, sig,
          pairs, standing, removedDocs, DedupOps.Q141Cap, Some(pidSize))
        .groupBy(col("comp"))
        .agg(min(col("id")).as("canonical_id"),
          count(lit(1)).as("n_docs"),
          concat_ws(",", transform(sort_array(collect_list(col("id"))),
            x => x.cast("string"))).as("members"))
      // One tagged relation over the four families' post-epoch states.
      val nl = lit(null).cast("long")
      sess2
        .select(lit("sessions").as("family"), col("user_id").as("k1"),
          col("start_us").as("k2"), col("n_events").as("v1"),
          col("end_us").as("v2"))
        .unionByName(Analytic.funnelReport(fun2)
          .select(lit("funnel").as("family"), col("user_id").as("k1"),
            col("reached_step").cast("long").as("k2"),
            col("v2c_micros").as("v1"), col("c2p_micros").as("v2")))
        .unionByName(Analytic.retentionReport(retC2)
          .select(lit("retention").as("family"),
            datediff(col("cohort_day"), lit("1970-01-01").cast("date"))
              .cast("long").as("k1"),
            col("day_offset").cast("long").as("k2"),
            col("n_users").as("v1"), nl.as("v2")))
        .unionByName(clusters
          .select(lit("clusters").as("family"),
            col("canonical_id").as("k1"), col("n_docs").as("k2"),
            h60(col("members")).as("v1"), nl.as("v2")))
        .orderBy(col("family"), col("k1"), col("k2"))
    },
    Some(s"""SELECT family, k1, k2, v1, v2 FROM (
      SELECT 'sessions' AS family, user_id AS k1, start_us AS k2,
             n_events AS v1, end_us AS v2
      FROM (${Analytic.q136.oracle.get}) s136
      UNION ALL
      SELECT 'funnel' AS family, user_id AS k1,
             CAST(reached_step AS BIGINT) AS k2,
             v2c_micros AS v1, c2p_micros AS v2
      FROM (${StreamingOps.q130.oracle.get}) f130
      UNION ALL
      SELECT 'retention' AS family,
             CAST(cohort_day - DATE '1970-01-01' AS BIGINT) AS k1,
             CAST(day_offset AS BIGINT) AS k2,
             n_users AS v1, CAST(NULL AS BIGINT) AS v2
      FROM (${Analytic.q137.oracle.get}) r137
      UNION ALL
      SELECT 'clusters' AS family, canonical_id AS k1, n_docs AS k2,
             ${oH60("members")} AS v1, CAST(NULL AS BIGINT) AS v2
      FROM (${DedupOps.q141.oracle.get}) c141
    ) ORDER BY family, k1, k2"""),
    prepare = Some((s, dir) => prepPut(s, dir, "prep140", q140Arts(s, dir))))

  // ---- q144: the INGEST epoch — q140's sibling on the document side
  // of the nightly job ("merge the day's accepted docs into the
  // indexes and clusters"): ONE dataflow folds the day's accepted
  // batch into the text index (q101), the embedding index (q102), and
  // the near-dup clusters (q105), sharing the "ingest:" accepted
  // split across families the way q140 shares the event batch. Each
  // half is the registered operator verbatim; the composition is what
  // the per-family gates cannot witness. The oracle embeds
  // q101/q102/q105's merge oracles as subqueries over one tagged
  // relation (the q140 device) — string-valued columns (bucket keys,
  // id lists, member lists) ride as h60 hashes, cross-engine
  // deterministic by construction.

  val q144 = Q(
    "q144_ingest_epoch",
    "ingest epoch: the day's accepted docs merged into the text index, embedding index, and clusters in one dataflow — every family == its merge oracle",
    (s, dir) => {
      import DedupOps._
      val incD = h60(concat(lit("ingest:"), col("doc_id"))) % 10 === 0
      val incV = h60(concat(lit("ingest:"), col("vec_id"))) % 10 === 0
      def idx(merged: DataFrame, family: String): DataFrame =
        merged.select(lit(family).as("family"),
          col("band").cast("long").as("k1"),
          h60(col("key")).as("k2"),
          size(col("ids")).cast("long").as("v1"),
          h60(concat((size(col("ids")) === 0).cast("string"), lit(":"),
            concat_ws(",", transform(col("ids"), x => x.cast("string")))))
            .as("v2"))
      val ti = idx(mergeIndexBuckets(
        cappedIndexBuckets(bandedFor(s, dir, !incD), Q96Cap),
        bandedFor(s, dir, incD), Q96Cap), "text_index")
      val ei = idx(mergeIndexBuckets(
        cappedIndexBuckets(embBandedFor(s, dir, !incV), Q91Cap),
        embBandedFor(s, dir, incV), Q91Cap), "embedding_index")
      val (standing, matches) = prepTake(s, dir, "prep144")(q105Arts(s, dir))
      val cl = mergeComponents(standing, matches).groupBy(col("comp"))
        .agg(min(col("id")).as("canonical_id"),
          count(lit(1)).as("n_docs"),
          sum((h60(concat(lit("ingest:"), col("id"))) % 10 === 0)
            .cast("long")).as("n_incoming"),
          concat_ws(",", transform(sort_array(collect_list(col("id"))),
            x => x.cast("string"))).as("members"))
        .select(lit("clusters").as("family"),
          col("canonical_id").as("k1"), col("n_docs").as("k2"),
          col("n_incoming").as("v1"), h60(col("members")).as("v2"))
      ti.unionByName(ei).unionByName(cl)
        .orderBy(col("family"), col("k1"), col("k2"))
    },
    Some {
      def idx(oracle: String, family: String) =
        s"""SELECT '$family' AS family, CAST(band AS BIGINT) AS k1,
             ${oH60("CAST(key AS VARCHAR)")} AS k2, n_kept AS v1,
             ${oH60("CAST(dropped AS VARCHAR) || ':' || ids")} AS v2
           FROM ($oracle) ${family.take(4)}"""
      s"""SELECT family, k1, k2, v1, v2 FROM (
        ${idx(DedupOps.q101.oracle.get, "text_index")}
        UNION ALL
        ${idx(DedupOps.q102.oracle.get, "embedding_index")}
        UNION ALL
        SELECT 'clusters' AS family, canonical_id AS k1, n_docs AS k2,
               n_incoming AS v1, ${oH60("members")} AS v2
        FROM (${DedupOps.q105.oracle.get}) c105
      ) ORDER BY family, k1, k2"""
    },
    prepare = Some((s, dir) =>
      prepPut(s, dir, "prep144", DedupOps.q105Arts(s, dir))))
}
