package graft.queries

import graft.Q
import graft.etl._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Contact-pipeline capabilities over the synthetic corpus
  * (graft.etl.Synth): name grammar, E.164, email validation, lookup
  * normalization, blocked fuzzy pair scoring, full dedupe+merge,
  * quality/confidence scoring, tagging + referral ranking.
  *
  * Oracle strategy: stages expressible in ANSI SQL are checked exactly
  * against DuckDB over Synth's SQL mirror. The fuzzy pair-scoring query
  * uses levenshtein-ratio similarity (identical builtin in both
  * engines); the reference-fidelity Ratcliff–Obershelp path is used by
  * the full dedupe query (q45, rows-only here) and pinned by ScalaTest
  * parity fixtures (SURVEY.md §7.4.3).
  */
object ContactOps {

  /** Normalized synthetic corpus, materialized once per (session, dir)
    * and shared by every downstream stage query — mirroring the
    * reference pipeline, where consolidate writes its artifact once
    * and validate/confidence/tag re-read it instead of recomputing
    * (validate_quality.py:133, tag_contacts.py:119). localCheckpoint
    * truncates the lineage so consumers stop re-analyzing (and
    * re-running) the normalize map; blocks are cleaner-released when
    * the session drops the reference. */
  private val normMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Dataset[Contact]]()
  registerMemo(normMemo) // evicted when the owning session's context ends

  private def normalized(s: SparkSession, dir: String) =
    // Keyed on sessionUUID (stable + unique), not identityHashCode: an
    // identity hash can be reused by a new session after the old one is
    // GC'd, which would hand it a Dataset bound to a dead session.
    // The repartition spreads the CPU-heavy normalize map across the
    // cluster: the corpus parquet is a single split, so the narrow map
    // would otherwise run as ONE task (measured 6×; the tiny-row
    // shuffle is ~free — see Pipeline.normalize's contract).
    normMemo.computeIfAbsent(s"${sessionKey(s)}:$dir",
      _ => Pipeline.normalize(Synth.contacts(s, dir)
        .repartition(s.sparkContext.defaultParallelism)).localCheckpoint(true))

  /** Default-config dedupe+merge output (merged contacts + lineage),
    * materialized once per (session, dir) — the same consolidate-
    * writes-once argument as [[normMemo]]: the reference runs the
    * expensive consolidate stage ONCE and every later stage re-reads
    * its artifacts (Makefile:55), so the engine-side equivalents
    * (q45's projection, q87's composed validate→confidence→tag) share
    * one materialization instead of re-running blocking + pair
    * scoring + CC + cluster merge per query. Non-default configs
    * (q72's stop-key cap) never consult the memo. */
  private val mergedMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.sql.Dataset[MergedContact],
      org.apache.spark.sql.Dataset[Lineage])]()
  registerMemo(mergedMemo) // evicted when the owning session's context ends

  private def mergedDefault(s: SparkSession, dir: String) =
    mergedMemo.computeIfAbsent(s"${sessionKey(s)}:$dir", _ => {
      val (m, l) = Pipeline.dedupeContactsWithLineage(normalized(s, dir))
      (m.localCheckpoint(true), l.localCheckpoint(true))
    })

  // -- q40: name grammar ------------------------------------------------

  val q40 = Q(
    "q40_name_parse",
    "full-name grammar: prefix/suffix strip + multi-last parse (UDF path)",
    (s, dir) => {
      import s.implicits._
      normalized(s, dir)
        .map(c => (c.row_id, c.prefix, c.first_name, c.last_name, c.suffix, c.full_name))
        .toDF("custkey", "prefix", "first_name", "last_name", "suffix", "full_name")
        .orderBy("custkey")
    },
    Some(s"""WITH ${Synth.sqlNormCte}
      SELECT k AS custkey, prefix, first_name, last_name, suffix, full_name
      FROM scontact ORDER BY custkey"""))

  // -- q41: E.164 (native column-expression path) -----------------------

  /** E.164 fallback as a pure column expression (codegen; mirrors
    * Phones.formatE164 / normalization.py:297-327). */
  def e164Col(raw: Column): Column = {
    val t = trim(raw)
    val digits = regexp_replace(t, "[^0-9]", "")
    when(t === "", "")
      .when(length(digits) === 10, concat(lit("+1"), digits))
      .when(length(digits) === 11 && digits.startsWith("1"), concat(lit("+"), digits))
      .when(length(digits) > 11 && length(digits) <= 15 && !t.startsWith("+"),
        concat(lit("+"), digits))
      .when(t.startsWith("+"), regexp_replace(t, "[^0-9+]", ""))
      .when(length(digits) > 0, concat(lit("+1"), digits))
      .otherwise(t)
  }

  def phoneValidCol(e164: Column): Column = {
    val digits = regexp_replace(e164, "[^0-9]", "")
    e164.startsWith("+") && length(digits) >= 11
  }

  val q41 = Q(
    "q41_phone_e164",
    "E.164 fallback formatting + validity as native column expressions",
    (s, dir) => {
      val c = Synth.contacts(s, dir).toDF()
      c.where(size(col("phones")) > 0)
        .select(col("row_id").as("custkey"),
          element_at(col("phones"), 1).getField("value").as("phone_raw"))
        .withColumn("e164", e164Col(col("phone_raw")))
        .withColumn("is_valid", phoneValidCol(col("e164")))
        .orderBy("custkey")
    },
    Some(s"""WITH ${Synth.sqlNormCte}
      SELECT k AS custkey, phone_raw, phone_e164 AS e164,
        phone_e164 LIKE '+%' AND length(phone_digits) >= 11 AS is_valid
      FROM scontact WHERE trim(phone_raw) <> '' ORDER BY custkey"""))

  // -- q42: email validation (native regex path) ------------------------

  val EmailReSql = "^[A-Za-z0-9._%+\\-']+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}$"

  val q42 = Q(
    "q42_email_validate",
    "fallback email validation: space-strip + lowercase + regex gate",
    (s, dir) => {
      val c = Synth.contacts(s, dir).toDF()
      val candidate = lower(regexp_replace(trim(
        element_at(col("emails"), 1).getField("value")), " ", ""))
      c.where(size(col("emails")) > 0)
        .select(col("row_id").as("custkey"),
          element_at(col("emails"), 1).getField("value").as("email_raw"))
        .withColumn("email_norm",
          when(lower(regexp_replace(trim(col("email_raw")), " ", "")).rlike(EmailReSql),
            lower(regexp_replace(trim(col("email_raw")), " ", ""))).otherwise(""))
        .withColumn("is_valid", col("email_norm") =!= "")
        .orderBy("custkey")
    },
    Some(s"""WITH ${Synth.sqlNormCte}
      SELECT k AS custkey, email_raw, email_norm, email_norm <> '' AS is_valid
      FROM scontact WHERE trim(email_raw) <> '' ORDER BY custkey"""))

  // -- q43: lookup-table normalization (broadcast join path) ------------

  val q43 = Q(
    "q43_state_lookup",
    "US-state name -> code via broadcast lookup join (dim-join pattern)",
    (s, dir) => {
      import s.implicits._
      val lookup = graft.functions.Lookups.StateAbbr.toSeq.toDF("state_lower", "abbr")
      val c = Synth.contacts(s, dir).toDF()
        .where(size(col("addresses")) > 0)
        .select(col("row_id").as("custkey"),
          element_at(col("addresses"), 1).getField("state").as("state_raw"))
      c.join(broadcast(lookup), lower(col("state_raw")) === col("state_lower"), "left")
        .withColumn("state_norm",
          when(col("state_raw") === "", "")
            .when(length(col("state_raw")) === 2 && col("state_raw").rlike("^[A-Za-z]{2}$"),
              upper(col("state_raw")))
            .when(col("abbr").isNotNull, col("abbr"))
            .otherwise(upper(col("state_raw"))))
        .select(col("custkey"), col("state_raw"), col("state_norm"))
        .orderBy("custkey")
    },
    Some(s"""WITH ${Synth.sqlNormCte}
      SELECT k AS custkey, state_raw, state_norm
      FROM scontact WHERE has_addr ORDER BY custkey"""))

  // -- q44: blocked fuzzy pair scoring (self-join + theta predicate) ----

  private val PairCap = 300

  val q44 = Q(
    "q44_merge_pairs",
    "blocked self-join, levenshtein-ratio merge scoring + decision rule",
    (s, dir) => {
      val base = Synth.contacts(s, dir).toDF()
        .where(col("row_id") <= PairCap)
        .select(
          col("row_id").as("k"),
          element_at(split(col("full_name_raw"), " "), -1).as("raw_last"),
          col("full_name_raw"), col("source"), col("linkedin_url"),
          when(size(col("emails")) > 0, element_at(col("emails"), 1).getField("value"))
            .otherwise("").as("email_raw"),
          when(size(col("phones")) > 0, element_at(col("phones"), 1).getField("value"))
            .otherwise("").as("phone_raw"),
          when(size(col("addresses")) > 0, concat_ws("\u0001",
            element_at(col("addresses"), 1).getField("city"),
            element_at(col("addresses"), 1).getField("state"),
            element_at(col("addresses"), 1).getField("postal_code")))
            .otherwise("").as("addr_key"))
      // normalized comparison fields (same derivations as the oracle)
      val withNorm = base
        .withColumn("last_name",
          when(col("raw_last") === "Jr", element_at(split(col("full_name_raw"), " "), -2))
            .otherwise(col("raw_last")))
        .withColumn("first_name", when(col("full_name_raw").startsWith("Dr. "),
          element_at(split(col("full_name_raw"), " "), 2))
          .otherwise(element_at(split(col("full_name_raw"), " "), 1)))
        .withColumn("suffix", when(col("raw_last") === "Jr", "Jr").otherwise(""))
        .withColumn("email_val",
          when(lower(regexp_replace(trim(col("email_raw")), " ", "")).rlike(EmailReSql),
            lower(regexp_replace(trim(col("email_raw")), " ", "")))
            .otherwise(trim(col("email_raw"))))
        .withColumn("phone_val",
          when(phoneValidCol(e164Col(col("phone_raw"))), e164Col(col("phone_raw")))
            .otherwise(trim(col("phone_raw"))))
      val a = withNorm.select(withNorm.columns.toIndexedSeq.map(c => col(c).as(s"a_$c")): _*)
      val b = withNorm.select(withNorm.columns.toIndexedSeq.map(c => col(c).as(s"b_$c")): _*)
      val sim = lit(1.0) - levenshtein(lower(col("a_first_name")), lower(col("b_first_name")))
        .cast("double") / greatest(length(col("a_first_name")), length(col("b_first_name")))
        .cast("double")
      val emailsOverlap = col("a_email_val") =!= "" && col("a_email_val") === col("b_email_val")
      val phonesOverlap = col("a_phone_val") =!= "" && col("a_phone_val") === col("b_phone_val")
      val addrOverlap = col("a_addr_key") =!= "" && col("a_addr_key") === col("b_addr_key")
      val linkedinEq = col("a_linkedin_url") =!= "" &&
        col("a_linkedin_url") === col("b_linkedin_url")
      val suffixEq = col("a_suffix") =!= "" &&
        lower(col("a_suffix")) === lower(col("b_suffix"))
      val score = lit(0.7) * sim +
        when(suffixEq, 0.1).otherwise(0.0) +
        when(emailsOverlap, 1.0).otherwise(0.0) +
        when(phonesOverlap, 1.0).otherwise(0.0) +
        when(addrOverlap, 0.5).otherwise(0.0) +
        when(linkedinEq, 0.8).otherwise(0.0)
      val namesAlign = lower(col("a_first_name")) === lower(col("b_first_name"))
      val lastEq = lower(col("a_last_name")) === lower(col("b_last_name"))
      val genEq = lower(col("a_suffix")) === lower(col("b_suffix"))
      val ok0 = score >= 1.2 || (sim >= 0.88 && score >= 0.6)
      val gate = namesAlign || emailsOverlap || linkedinEq
      val liGate = !(col("a_source") === "linkedin" || col("b_source") === "linkedin") ||
        emailsOverlap || (lastEq && namesAlign && genEq)
      a.join(b, lower(col("a_last_name")) === lower(col("b_last_name")) &&
          col("a_k") < col("b_k"))
        .select(col("a_k").as("left_key"), col("b_k").as("right_key"),
          round(sim, 4).as("first_sim"),
          round(score, 2).as("score"),
          (ok0 && gate && liGate).as("merged"))
        .orderBy("left_key", "right_key")
    },
    Some(s"""WITH ${Synth.sqlNormCte},
      cmp AS (
        SELECT k, source, linkedin_url, first_name, last_name, suffix,
          CASE WHEN email_norm <> '' THEN email_norm ELSE trim(email_raw) END AS email_val,
          CASE WHEN phone_e164 LIKE '+%' AND length(phone_digits) >= 11
               THEN phone_e164 ELSE trim(phone_raw) END AS phone_val,
          CASE WHEN has_addr THEN city || chr(1) || state_raw || chr(1) || postal ELSE '' END AS addr_key
        FROM scontact WHERE k <= $PairCap),
      pairs AS (
        SELECT a.k AS left_key, b.k AS right_key,
          1.0 - CAST(levenshtein(lower(a.first_name), lower(b.first_name)) AS DOUBLE)
              / CAST(greatest(length(a.first_name), length(b.first_name)) AS DOUBLE) AS sim,
          a.email_val <> '' AND a.email_val = b.email_val AS emails_overlap,
          a.phone_val <> '' AND a.phone_val = b.phone_val AS phones_overlap,
          a.addr_key <> '' AND a.addr_key = b.addr_key AS addr_overlap,
          a.linkedin_url <> '' AND a.linkedin_url = b.linkedin_url AS linkedin_eq,
          a.suffix <> '' AND lower(a.suffix) = lower(b.suffix) AS suffix_eq,
          lower(a.first_name) = lower(b.first_name) AS names_align,
          lower(a.last_name) = lower(b.last_name) AS last_eq,
          lower(a.suffix) = lower(b.suffix) AS gen_eq,
          a.source = 'linkedin' OR b.source = 'linkedin' AS has_linkedin_src
        FROM cmp a JOIN cmp b
          ON lower(a.last_name) = lower(b.last_name) AND a.k < b.k),
      scored AS (
        SELECT *,
          0.7 * sim + CASE WHEN suffix_eq THEN 0.1 ELSE 0.0 END
            + CASE WHEN emails_overlap THEN 1.0 ELSE 0.0 END
            + CASE WHEN phones_overlap THEN 1.0 ELSE 0.0 END
            + CASE WHEN addr_overlap THEN 0.5 ELSE 0.0 END
            + CASE WHEN linkedin_eq THEN 0.8 ELSE 0.0 END AS score
        FROM pairs)
      SELECT left_key, right_key, round(sim, 4) AS first_sim,
        round(score, 2) AS score,
        (score >= 1.2 OR (sim >= 0.88 AND score >= 0.6))
          AND (names_align OR emails_overlap OR linkedin_eq)
          AND (NOT has_linkedin_src OR emails_overlap
               OR (last_eq AND names_align AND gen_eq)) AS merged
      FROM scored ORDER BY left_key, right_key"""))

  // -- q64: dedupe components + cluster stats (oracle-checked CC) -------

  /** The connected-components half of the dedupe pipeline under the
    * DuckDB oracle. q45 (below) runs the reference-fidelity
    * Ratcliff–Obershelp path whose UUIDv5 ids and R-O similarity DuckDB
    * cannot reproduce (no sha1(), different edit-distance), so it is
    * rows-only checked; THIS query runs the same dataflow shape —
    * blocked self-join → scored decision rule → [[Pipeline.connectedComponents]]
    * → per-cluster aggregation — with the levenshtein-ratio similarity
    * that is bit-identical in both engines, making blocking, scoring,
    * gating, transitive closure (min-label) and cluster aggregation all
    * hash-checked. The oracle rebuilds the closure with 10 chained
    * min-label propagation steps (component min-label radius here is
    * ≤ 4; 10 gives slack).
    *
    * Scale note: the pair stage is the reference's own O(Σ b²) block
    * scan (combine_contacts.py:1149-1152) — adequate because blocks are
    * surname-bounded; the q45 path upgrades it to an inverted-index
    * equi-join when key overlap is sparse. */
  val q64 = Q(
    "q64_dedupe_components",
    "blocked scoring -> connected components -> per-cluster stats (oracle-checked)",
    (s, dir) => {
      import s.implicits._
      // repartition BEFORE the regex/validation-heavy projections: the
      // corpus parquet is a single split, so the narrow map would
      // otherwise run (and checkpoint) as ONE task — measured ~0.45 s
      // serial vs ~0.05 s spread across the cluster; the tiny-row
      // shuffle is ~free (same contract as Pipeline.normalize).
      val base = Synth.contacts(s, dir).toDF()
        .repartition(s.sparkContext.defaultParallelism)
        .select(
          col("row_id").as("k"),
          element_at(split(col("full_name_raw"), " "), -1).as("raw_last"),
          col("full_name_raw"), col("source"), col("linkedin_url"),
          when(size(col("emails")) > 0, element_at(col("emails"), 1).getField("value"))
            .otherwise("").as("email_raw"),
          when(size(col("phones")) > 0, element_at(col("phones"), 1).getField("value"))
            .otherwise("").as("phone_raw"),
          when(size(col("addresses")) > 0, concat_ws("\u0001",
            element_at(col("addresses"), 1).getField("city"),
            element_at(col("addresses"), 1).getField("state"),
            element_at(col("addresses"), 1).getField("postal_code")))
            .otherwise("").as("addr_key"))
      val withNorm = base
        .withColumn("last_name",
          when(col("raw_last") === "Jr", element_at(split(col("full_name_raw"), " "), -2))
            .otherwise(col("raw_last")))
        .withColumn("first_name", when(col("full_name_raw").startsWith("Dr. "),
          element_at(split(col("full_name_raw"), " "), 2))
          .otherwise(element_at(split(col("full_name_raw"), " "), 1)))
        .withColumn("suffix", when(col("raw_last") === "Jr", "Jr").otherwise(""))
        .withColumn("email_val",
          when(lower(regexp_replace(trim(col("email_raw")), " ", "")).rlike(EmailReSql),
            lower(regexp_replace(trim(col("email_raw")), " ", "")))
            .otherwise(trim(col("email_raw"))))
        .withColumn("phone_val",
          when(phoneValidCol(e164Col(col("phone_raw"))), e164Col(col("phone_raw")))
            .otherwise(trim(col("phone_raw"))))
        .localCheckpoint(true)
      val sim = lit(1.0) - levenshtein(lower(col("a_first_name")), lower(col("b_first_name")))
        .cast("double") / greatest(length(col("a_first_name")), length(col("b_first_name")))
        .cast("double")
      val emailsOverlap = col("a_email_val") =!= "" && col("a_email_val") === col("b_email_val")
      val phonesOverlap = col("a_phone_val") =!= "" && col("a_phone_val") === col("b_phone_val")
      val addrOverlap = col("a_addr_key") =!= "" && col("a_addr_key") === col("b_addr_key")
      val linkedinEq = col("a_linkedin_url") =!= "" &&
        col("a_linkedin_url") === col("b_linkedin_url")
      val suffixEq = col("a_suffix") =!= "" &&
        lower(col("a_suffix")) === lower(col("b_suffix"))
      val score = lit(0.7) * sim +
        when(suffixEq, 0.1).otherwise(0.0) +
        when(emailsOverlap, 1.0).otherwise(0.0) +
        when(phonesOverlap, 1.0).otherwise(0.0) +
        when(addrOverlap, 0.5).otherwise(0.0) +
        when(linkedinEq, 0.8).otherwise(0.0)
      val namesAlign = lower(col("a_first_name")) === lower(col("b_first_name"))
      val lastEq = lower(col("a_last_name")) === lower(col("b_last_name"))
      val genEq = lower(col("a_suffix")) === lower(col("b_suffix"))
      val ok0 = score >= 1.2 || (sim >= 0.88 && score >= 0.6)
      val gate = namesAlign || emailsOverlap || linkedinEq
      val liGate = !(col("a_source") === "linkedin" || col("b_source") === "linkedin") ||
        emailsOverlap || (lastEq && namesAlign && genEq)
      // Gate-implied candidate pruning: a pair can only pass `gate` if
      // it shares the lowercase first name, the email value, or the
      // linkedin url — so candidate generation is an equi-join on those
      // three keys within the block, never the O(b²) block scan the
      // oracle (correctly, at its scale) performs. Exact-name cliques
      // (block, first, suffix) are always accepted (sim=1, relaxed
      // path, genEq) and contribute O(m) spanning chains, excluded from
      // pairwise work via clique-id inequality — same devices as the
      // reference-fidelity path (Pipeline.acceptedPairs).
      val cqKey = concat_ws("\u0001", lower(col("last_name")),
        lower(col("first_name")), lower(col("suffix")))
      // Clique chains only for rows with a core name: an empty
      // first+last would chain unrelated rows into one component while
      // the oracle's pairwise rule rejects them (levenshtein sim is
      // NULL on empty names). Unnamed rows get a unique clique id so
      // they still flow through the pairwise path (mirrors the coreRow
      // guard in Pipeline.acceptedPairs).
      val named = col("first_name") =!= "" && col("last_name") =!= ""
      val cqCol = when(named, cqKey).otherwise(concat(lit("__"), col("k")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(cqKey)
      val chains = withNorm.where(named)
        .select(col("k"), min(col("k")).over(w).as("root"))
        .where(col("k") =!= col("root"))
        .select(col("root").as("src"), col("k").as("dst")).as[Pipeline.Edge]
      // Payload-carrying inverted index: each exploded key row carries
      // the fields the decision rule reads, so the self-join yields
      // scored pairs directly — no distinct and no join-back to the
      // full table (3 shuffle stages saved; one exchange, reused by
      // both sides). Duplicate pairs from multi-key overlap are NOT
      // deduped: union-find and the contraction quotient are
      // idempotent in duplicate edges, so dedup would buy nothing but
      // a shuffle.
      val flds = Seq("k", "first_name", "last_name", "suffix", "email_val",
        "phone_val", "addr_key", "linkedin_url", "source")
      val kk = withNorm.select(lower(col("last_name")).as("blk"),
          cqCol.as("cq"),
          struct(flds.map(col): _*).as("p"),
          explode(array(
            concat(lit("n:"), lower(col("first_name"))),
            when(col("email_val") =!= "", concat(lit("e:"), col("email_val"))),
            when(col("linkedin_url") =!= "", concat(lit("l:"), col("linkedin_url")))))
            .as("ck"))
        .where(col("ck").isNotNull)
      val pairEdges = kk.as("x").join(kk.as("y"),
          col("x.blk") === col("y.blk") && col("x.ck") === col("y.ck") &&
            col("x.p.k") < col("y.p.k") && col("x.cq") =!= col("y.cq"))
        .select(flds.map(f => col(s"x.p.$f").as(s"a_$f")) ++
          flds.map(f => col(s"y.p.$f").as(s"b_$f")): _*)
        .where(ok0 && gate && liGate)
        .select(col("a_k").as("src"), col("b_k").as("dst"))
        .as[Pipeline.Edge]
      val comps = Pipeline.connectedComponents(
        withNorm.select(col("k").as[java.lang.Long]), pairEdges.union(chains))
      withNorm.join(comps, withNorm("k") === comps("id"))
        .groupBy(col("comp").as("cluster_key"))
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(when(col("email_val") =!= "", col("email_val"))).as("n_emails"),
          countDistinct(when(col("phone_val") =!= "", col("phone_val"))).as("n_phones"),
          countDistinct(when(col("addr_key") =!= "", col("addr_key"))).as("n_addrs"))
        .orderBy(col("cluster_key"))
    },
    Some {
      // MATERIALIZED: each step reads the previous one twice; DuckDB
      // inlines plain CTEs, which would re-evaluate the whole chain
      // exponentially.
      val steps = (1 to 10).map { i =>
        s"""l$i AS MATERIALIZED (
        SELECT v.k, least(v.lab, coalesce(min(n.lab), v.lab)) AS lab
        FROM l${i - 1} v
        LEFT JOIN sym e ON e.a = v.k
        LEFT JOIN l${i - 1} n ON n.k = e.b
        GROUP BY v.k, v.lab)"""
      }.mkString(",\n      ")
      s"""WITH ${Synth.sqlNormCte},
      cmp AS (
        SELECT k, source, linkedin_url, first_name, last_name, suffix,
          CASE WHEN email_norm <> '' THEN email_norm ELSE trim(email_raw) END AS email_val,
          CASE WHEN phone_e164 LIKE '+%' AND length(phone_digits) >= 11
               THEN phone_e164 ELSE trim(phone_raw) END AS phone_val,
          CASE WHEN has_addr THEN city || chr(1) || state_raw || chr(1) || postal ELSE '' END AS addr_key
        FROM scontact),
      pairs AS (
        SELECT a.k AS src, b.k AS dst,
          1.0 - CAST(levenshtein(lower(a.first_name), lower(b.first_name)) AS DOUBLE)
              / CAST(greatest(length(a.first_name), length(b.first_name)) AS DOUBLE) AS sim,
          a.email_val <> '' AND a.email_val = b.email_val AS emails_overlap,
          a.phone_val <> '' AND a.phone_val = b.phone_val AS phones_overlap,
          a.addr_key <> '' AND a.addr_key = b.addr_key AS addr_overlap,
          a.linkedin_url <> '' AND a.linkedin_url = b.linkedin_url AS linkedin_eq,
          a.suffix <> '' AND lower(a.suffix) = lower(b.suffix) AS suffix_eq,
          lower(a.first_name) = lower(b.first_name) AS names_align,
          lower(a.last_name) = lower(b.last_name) AS last_eq,
          lower(a.suffix) = lower(b.suffix) AS gen_eq,
          a.source = 'linkedin' OR b.source = 'linkedin' AS has_linkedin_src
        FROM cmp a JOIN cmp b
          ON lower(a.last_name) = lower(b.last_name) AND a.k < b.k),
      edges AS (
        SELECT src, dst FROM (
          SELECT *,
            0.7 * sim + CASE WHEN suffix_eq THEN 0.1 ELSE 0.0 END
              + CASE WHEN emails_overlap THEN 1.0 ELSE 0.0 END
              + CASE WHEN phones_overlap THEN 1.0 ELSE 0.0 END
              + CASE WHEN addr_overlap THEN 0.5 ELSE 0.0 END
              + CASE WHEN linkedin_eq THEN 0.8 ELSE 0.0 END AS score
          FROM pairs)
        WHERE (score >= 1.2 OR (sim >= 0.88 AND score >= 0.6))
          AND (names_align OR emails_overlap OR linkedin_eq)
          AND (NOT has_linkedin_src OR emails_overlap
               OR (last_eq AND names_align AND gen_eq))),
      sym AS MATERIALIZED (
        SELECT src AS a, dst AS b FROM edges
        UNION ALL SELECT dst AS a, src AS b FROM edges),
      l0 AS MATERIALIZED (SELECT k, k AS lab FROM cmp),
      $steps
      SELECT l10.lab AS cluster_key, count(*) AS n_members,
        count(DISTINCT c.source) AS n_sources,
        count(DISTINCT CASE WHEN c.email_val <> '' THEN c.email_val END) AS n_emails,
        count(DISTINCT CASE WHEN c.phone_val <> '' THEN c.phone_val END) AS n_phones,
        count(DISTINCT CASE WHEN c.addr_key <> '' THEN c.addr_key END) AS n_addrs
      FROM l10 JOIN cmp c ON c.k = l10.k
      GROUP BY l10.lab ORDER BY cluster_key"""
    })

  // -- q45: full dedupe + cluster merge (reference-fidelity path) -------

  /** Embedded Ratcliff–Obershelp similarity table over Synth's bounded
    * first-name vocabulary. The merge rule's only non-SQL primitive is
    * difflib-ratio similarity between first names; on this corpus every
    * compared first name is one of [[Synth.Firsts]] (code constants,
    * not data), so the full 16×16 ratio table is a fixed 120-row VALUES
    * list the oracle can join. Values come from the SAME
    * [[graft.functions.Similarity.seqRatio]] the engine executes
    * (difflib-parity pinned by FunctionsSpec), rendered shortest-
    * round-trip so DuckDB parses bit-identical doubles. */
  private def simTabSql: String = {
    val names = Synth.Firsts.map(_.toLowerCase)
    val rows = for { a <- names; b <- names if a < b }
      yield s"('$a','$b',CAST(${graft.functions.Similarity.seqRatio(a, b)} AS DOUBLE))"
    s"simtab(sa, sb, sim) AS (SELECT * FROM (VALUES ${rows.mkString(", ")}))"
  }

  /** DuckDB replica of the reference-fidelity dedupe+merge (the q45
    * dataflow) on the Synth corpus; `cap` additionally replicates the
    * engine's stop-key suppression (q72): a pair is eligible only
    * through a shared key whose per-block frequency is ≤ cap — except
    * exact-name-clique pairs (equal lowercase first AND suffix), which
    * the engine's clique collapse emits without consulting the
    * inverted index. Synth-specific exact reductions,
    * each verified against the engine's own semantics:
    *   - every row has a core name, so the nameless-corroborator gate
    *     never fires and blocks are exactly the (canonical) last name;
    *   - nickname equivalence is an identity no-op (all 16 Firsts have
    *     distinct nickname roots) and the max off-diagonal seqRatio is
    *     0.571 < 0.88, so the relaxed path and the name-vote fuzzy
    *     merge (≥0.9) fire only on exact-equal lowercase firsts;
    *   - choose_best_first_name reduces to: per member weight
    *     (linkedin→2 else 1) + 1.5 if it carries a valid email (the
    *     email-local guess always equals the member's own first name),
    *     argmax by weight then first appearance; the kept-invalid
    *     email's guess key ("invalid email") is never explicit and
    *     never fuzzy-merges, so it cannot win;
    *   - _choose_by_priority = first strictly-best non-empty value,
    *     i.e. ORDER BY ts DESC NULLS LAST, priority DESC, position.
    * The closure uses 16 chained min-label rounds (component label
    * radius at sf0.01 is ≤ 7; 16 gives slack). */
  /** _choose_by_priority (combine_contacts.py:264-277): first
    * strictly-best non-empty value in cluster order — the sequential
    * fold replaces only on a STRICTLY better (timestamp, priority)
    * rank, so it reduces to an argmax with first-appearance (pos)
    * tiebreak. */
  private def byPrioritySql(colName: String, alias: String): String =
    s"""sel_$alias AS (
        SELECT comp, $colName AS $alias FROM (
          SELECT comp, $colName, row_number() OVER (PARTITION BY comp
            ORDER BY dt DESC NULLS LAST, prio DESC, pos) AS rn
          FROM mm WHERE $colName <> '') WHERE rn = 1)"""

  /** The shared dedupe+merge CTE chain (synth corpus → normalized
    * members → accepted pairs → 16-round min-label closure → cluster
    * members `mm` → chooseByPriority selections + first-name vote +
    * per-cluster aggregates `agg`). q45/q72 append the merged-output
    * projection; q87 layers the validate→confidence→tag stages on
    * top. Returned WITHOUT the leading WITH so callers can extend the
    * CTE list. */
  private def dedupeOracleCtes(cap: Option[Long] = None): String = {
    val steps = (1 to 16).map { i =>
      s"""l$i AS MATERIALIZED (
        SELECT v.k, least(v.lab, coalesce(min(n.lab), v.lab)) AS lab
        FROM l${i - 1} v
        LEFT JOIN sym e ON e.ea = v.k
        LEFT JOIN l${i - 1} n ON n.k = e.eb
        GROUP BY v.k, v.lab)"""
    }.mkString(",\n      ")
    // Per-(block, key) frequencies + the generation-eligibility term
    // for the stop-key cap (engine: Pipeline.acceptedPairs capped
    // branch). nickname-root keys coincide with name keys on this
    // vocabulary (every Synth first IS its own root), so no separate
    // nr term is needed.
    val capCtes = cap.map(_ => s""",
      nmdf AS (SELECT lname, lower(fname) AS f, count(*) AS df FROM mem GROUP BY 1, 2),
      emdf AS (SELECT lname, em_out, count(*) AS df FROM mem WHERE em_out <> '' GROUP BY 1, 2),
      phdf AS (SELECT lname, ph_out, count(*) AS df FROM mem WHERE ph_out <> '' GROUP BY 1, 2),
      akdf AS (SELECT lname, city, state_norm, postal, count(*) AS df FROM mem
               WHERE has_addr GROUP BY 1, 2, 3, 4),
      lidf AS (SELECT lname, linkedin_url, count(*) AS df FROM mem
               WHERE linkedin_url <> '' GROUP BY 1, 2)""").getOrElse("")
    val capJoins = cap.map(_ => s"""
        LEFT JOIN nmdf ON nmdf.lname = a.lname AND nmdf.f = lower(a.fname)
          AND lower(a.fname) = lower(b.fname)
        LEFT JOIN emdf ON emdf.lname = a.lname AND emdf.em_out = a.em_out
          AND a.em_out <> '' AND a.em_out = b.em_out
        LEFT JOIN phdf ON phdf.lname = a.lname AND phdf.ph_out = a.ph_out
          AND a.ph_out <> '' AND a.ph_out = b.ph_out
        LEFT JOIN akdf ON akdf.lname = a.lname AND akdf.city = a.city
          AND akdf.state_norm = a.state_norm AND akdf.postal = a.postal
          AND a.has_addr AND b.has_addr AND a.city = b.city
          AND a.state_norm = b.state_norm AND a.postal = b.postal
        LEFT JOIN lidf ON lidf.lname = a.lname AND lidf.linkedin_url = a.linkedin_url
          AND a.linkedin_url <> '' AND a.linkedin_url = b.linkedin_url""").getOrElse("")
    val capCol = cap.map(c => s""",
          ((lower(a.fname) = lower(b.fname) AND lower(a.suffix) = lower(b.suffix))
            OR (lower(a.fname) = lower(b.fname) AND nmdf.df <= $c)
            OR (a.em_out <> '' AND a.em_out = b.em_out AND emdf.df <= $c)
            OR (a.ph_out <> '' AND a.ph_out = b.ph_out AND phdf.df <= $c)
            OR (a.has_addr AND b.has_addr AND a.city = b.city
                AND a.state_norm = b.state_norm AND a.postal = b.postal AND akdf.df <= $c)
            OR (a.linkedin_url <> '' AND a.linkedin_url = b.linkedin_url AND lidf.df <= $c))
            AS eligible""").getOrElse(",\n          TRUE AS eligible")
    s"""${Synth.sqlNormCte},
      $simTabSql,
      mem AS (
        SELECT k, source, linkedin_url, company, title, prefix, suffix,
          department, notes, email_label, phone_label,
          (phone_e164 LIKE '+%' AND length(phone_digits) >= 11) AS phone_ok,
          first AS fname, last AS lname,
          CASE WHEN email_norm <> '' THEN email_norm
               WHEN trim(email_raw) <> '' THEN trim(email_raw)
               ELSE '' END AS em_out,
          email_norm,
          CASE WHEN trim(phone_raw) = '' THEN ''
               WHEN phone_e164 LIKE '+%' AND length(phone_digits) >= 11 THEN phone_e164
               ELSE trim(phone_raw) END AS ph_out,
          has_addr, street, city, state_norm, postal, addr_label,
          CASE WHEN source = 'linkedin' THEN 3 WHEN source = 'mac_vcf' THEN 2
               WHEN source = 'gmail' THEN 1 ELSE 0 END AS prio,
          TRY_CAST(nullif(source_timestamp, '') AS DATE) AS dt
        FROM scontact)$capCtes,
      pairs AS (
        SELECT a.k AS src, b.k AS dst,
          CASE WHEN lower(a.fname) = lower(b.fname) THEN CAST(1.0 AS DOUBLE)
               ELSE coalesce(st.sim, CAST(0.0 AS DOUBLE)) END AS sim,
          a.em_out <> '' AND a.em_out = b.em_out AS email_ov,
          a.ph_out <> '' AND a.ph_out = b.ph_out AS phone_ov,
          a.has_addr AND b.has_addr AND a.city = b.city
            AND a.state_norm = b.state_norm AND a.postal = b.postal AS addr_ov,
          a.linkedin_url <> '' AND a.linkedin_url = b.linkedin_url AS li_eq,
          a.suffix <> '' AND lower(a.suffix) = lower(b.suffix) AS suffix_eq,
          lower(a.fname) = lower(b.fname) AS names_align,
          lower(a.suffix) = lower(b.suffix) AS gen_eq,
          a.source = 'linkedin' OR b.source = 'linkedin' AS has_li_src$capCol
        FROM mem a JOIN mem b ON a.lname = b.lname AND a.k < b.k
        LEFT JOIN simtab st ON st.sa = least(lower(a.fname), lower(b.fname))
          AND st.sb = greatest(lower(a.fname), lower(b.fname))$capJoins),
      edges AS (
        SELECT src, dst FROM (
          SELECT *,
            0.7 * sim + CASE WHEN suffix_eq THEN 0.1 ELSE 0.0 END
              + CASE WHEN email_ov THEN 1.0 ELSE 0.0 END
              + CASE WHEN phone_ov THEN 1.0 ELSE 0.0 END
              + CASE WHEN addr_ov THEN 0.5 ELSE 0.0 END
              + CASE WHEN li_eq THEN 0.8 ELSE 0.0 END AS score
          FROM pairs)
        WHERE eligible
          AND (score >= 1.2 OR (sim >= 0.88 AND score >= 0.6))
          AND (names_align OR email_ov OR li_eq)
          AND (NOT has_li_src OR email_ov OR (names_align AND gen_eq))),
      sym AS MATERIALIZED (
        SELECT src AS ea, dst AS eb FROM edges
        UNION ALL SELECT dst AS ea, src AS eb FROM edges),
      l0 AS MATERIALIZED (SELECT k, k AS lab FROM mem),
      $steps,
      mm AS MATERIALIZED (
        SELECT m.*, l16.lab AS comp,
          row_number() OVER (PARTITION BY l16.lab ORDER BY m.k) AS pos
        FROM mem m JOIN l16 ON l16.k = m.k),
      ${byPrioritySql("prefix", "prefix")},
      ${byPrioritySql("suffix", "suffix")},
      ${byPrioritySql("company", "company")},
      ${byPrioritySql("title", "title")},
      ${byPrioritySql("linkedin_url", "linkedin_url")},
      firstvote AS (
        SELECT comp, fname,
          sum(CASE WHEN source = 'linkedin' THEN 2.0 ELSE 1.0 END
            + CASE WHEN email_norm <> '' THEN 1.5 ELSE 0.0 END) AS w,
          min(pos) AS fp
        FROM mm GROUP BY comp, fname),
      bestfirst AS (
        SELECT comp, fname FROM (
          SELECT comp, fname, row_number() OVER (PARTITION BY comp
            ORDER BY w DESC, fp) AS rn FROM firstvote) WHERE rn = 1),
      el AS (
        SELECT comp, string_agg(v, '|' ORDER BY v) AS emails_list
        FROM (SELECT DISTINCT comp, em_out AS v FROM mm WHERE em_out <> '')
        GROUP BY comp),
      pl AS (
        SELECT comp, string_agg(v, '|' ORDER BY v) AS phones_list
        FROM (SELECT DISTINCT comp, ph_out AS v FROM mm WHERE ph_out <> '')
        GROUP BY comp),
      agg AS (
        SELECT comp,
          count(*) AS source_row_count,
          count(DISTINCT source) AS source_count,
          count(DISTINCT CASE WHEN em_out <> '' THEN em_out END) AS n_emails,
          count(DISTINCT CASE WHEN ph_out <> '' THEN ph_out END) AS n_phones,
          count(DISTINCT CASE WHEN has_addr THEN street || chr(1) || city
            || chr(1) || state_norm || chr(1) || postal || chr(1) || addr_label END)
            AS n_addresses,
          max(lname) AS lname
        FROM mm GROUP BY comp)"""
  }

  private def q45OracleSql(cap: Option[Long] = None): String =
    s"""WITH ${dedupeOracleCtes(cap)}
      SELECT
        trim(concat_ws(' ', nullif(sp.prefix, ''), bf.fname, agg.lname,
          nullif(ss.suffix, ''))) AS full_name,
        coalesce(sc.company, '') AS company,
        coalesce(st2.title, '') AS title,
        coalesce(sl.linkedin_url, '') AS linkedin_url,
        coalesce(el.emails_list, '') AS emails_list,
        coalesce(pl.phones_list, '') AS phones_list,
        agg.source_count, agg.source_row_count,
        agg.n_emails, agg.n_phones, agg.n_addresses
      FROM agg
      JOIN bestfirst bf USING (comp)
      LEFT JOIN sel_prefix sp USING (comp)
      LEFT JOIN sel_suffix ss USING (comp)
      LEFT JOIN sel_company sc USING (comp)
      LEFT JOIN sel_title st2 USING (comp)
      LEFT JOIN sel_linkedin_url sl USING (comp)
      LEFT JOIN el USING (comp)
      LEFT JOIN pl USING (comp)
      ORDER BY full_name, emails_list, phones_list, company, title, linkedin_url,
        source_count, source_row_count, n_emails, n_phones, n_addresses"""

  /** The flagship reference-fidelity dedupe+merge, hash-checked.
    *
    * The Spark side runs the REAL pipeline — typed normalize,
    * [[Pipeline.acceptedPairs]] (Ratcliff–Obershelp + nickname
    * machinery), tiered connected components, [[ContactLogic
    * .mergeCluster]] — and projects the merged output WITHOUT the
    * UUIDv5 `contact_id`: DuckDB has no sha1(), so the id itself is
    * verified by FunctionProps + ReferenceParitySpec goldens instead,
    * while everything the id is derived from (chosen name, channel
    * sets, lineage cluster membership) IS hashed here. Rows are fully
    * ordered by the entire projection, so the hash is deterministic
    * even under cluster-output ties. */
  private def mergedProjection(s: SparkSession, dir: String,
      cfg: ContactLogic.DedupeConfig): DataFrame = {
    import s.implicits._
    val merged =
      if (cfg == ContactLogic.DedupeConfig()) mergedDefault(s, dir)._1
      else Pipeline.dedupeContacts(normalized(s, dir), cfg)
    merged.map(m => (m.contact.full_name, m.contact.company, m.contact.title,
        m.contact.linkedin_url,
        m.contact.emails.map(_.value).mkString("|"),
        m.contact.phones.map(p =>
          graft.functions.Phones.withExtension(p.value, p.extension)).mkString("|"),
        m.source_count.toLong, m.source_row_count.toLong,
        m.contact.emails.size.toLong, m.contact.phones.size.toLong,
        m.contact.addresses.size.toLong))
      .toDF("full_name", "company", "title", "linkedin_url", "emails_list",
        "phones_list", "source_count", "source_row_count",
        "n_emails", "n_phones", "n_addresses")
      .orderBy("full_name", "emails_list", "phones_list", "company", "title",
        "linkedin_url", "source_count", "source_row_count",
        "n_emails", "n_phones", "n_addresses")
  }

  val q45 = Q(
    "q45_dedupe_merge",
    "block -> self-join -> R-O merge rule -> connected components -> cluster merge",
    (s, dir) => mergedProjection(s, dir, ContactLogic.DedupeConfig()),
    Some(q45OracleSql()))

  /** The stop-key scale knob, oracle-checked: same reference-fidelity
    * dedupe+merge but with matchKeyFrequencyCap = 50, which at sf0.01
    * bites exactly one key class — the shared "invalid email@@example"
    * value (75 carriers per affected surname block) that otherwise
    * bridges unrelated names into junk-key mega-components — while
    * every legitimate key (class emails/phones df ≈ 4, name keys
    * df ≈ 10) stays below it. The oracle replicates the exact
    * generation-only semantics (clique pairs exempt, full evidence for
    * surviving pairs), so the hash certifies the knob end-to-end. */
  val q72 = Q(
    "q72_dedupe_stopkey_cap",
    "dedupe+merge under the stop-key frequency cap (junk-key mega-components split)",
    (s, dir) => mergedProjection(s, dir,
      ContactLogic.DedupeConfig(matchKeyFrequencyCap = Some(50L))),
    Some(q45OracleSql(cap = Some(50L))))

  // -- q87: the composed end-to-end pipeline ----------------------------

  /** Oracle for the composed pipeline: the shared dedupe+merge CTEs
    * extended with the validate→confidence→tag arithmetic applied to
    * the MERGED clusters (the reference composes the four stage CLIs
    * through CSV files — Makefile:55; the math per stage is the same
    * as q46/q47's per-row oracles, re-based onto per-cluster channel
    * collections).
    *
    * Merged channel labels (the `_should_replace_label` fold,
    * combine_contacts.py:207-226) reduce to an argmax by (timestamp
    * DESC NULLS LAST, priority DESC, first-appearance) on this corpus:
    * the fold replaces only on a strictly better rank, and the two
    * non-rank replacement rules cannot fire here — rule 2 (same
    * priority, non-empty over empty label) needs two same-source
    * members of one cluster to carry the same value with different
    * labels, but Synth derives both email label and source from
    * k mod 3 (and phone labels from k mod 4, constant across a
    * class's members k ≡ r mod 400), and rule 3 ("other"-displacement)
    * needs a pre-render "other" label, which normalization never
    * produces. Kept-invalid channels are always labeled 'invalid'
    * (normalization.py:573-617).
    *
    * Domain bound: the argmax additionally needs strict rank order
    * between different-source carriers of one value, i.e. no
    * timestamp ties across sources. Synth timestamps cycle mod
    * lcm(12,28) = 84 and same-class members are 400 apart, so a
    * cross-source tie needs members ≥ 21·400 = 8400 ids apart in one
    * class — impossible at the oracle's sf0.01 (1.5k rows) and
    * sf0.001; at sf0.1+ the oracle text would need the sequential
    * fold (the driver's correctness gate runs at sf0.01). */
  private def q87OracleSql: String =
    s"""WITH ${dedupeOracleCtes()},
      emall AS (
        SELECT comp, em, CASE WHEN lab = '' THEN 'other' ELSE lab END AS lab FROM (
          SELECT comp, em_out AS em, email_label AS lab,
            row_number() OVER (PARTITION BY comp, em_out
              ORDER BY dt DESC NULLS LAST, prio DESC, pos) AS rn
          FROM mm WHERE email_norm <> '') WHERE rn = 1
        UNION ALL
        SELECT DISTINCT comp, em_out, 'invalid' FROM mm
        WHERE em_out <> '' AND email_norm = ''),
      phall AS (
        SELECT comp, ph, CASE WHEN lab = '' THEN 'other' ELSE lab END AS lab FROM (
          SELECT comp, ph_out AS ph, phone_label AS lab,
            row_number() OVER (PARTITION BY comp, ph_out
              ORDER BY dt DESC NULLS LAST, prio DESC, pos) AS rn
          FROM mm WHERE ph_out <> '' AND phone_ok) WHERE rn = 1
        UNION ALL
        SELECT DISTINCT comp, ph_out, 'invalid' FROM mm
        WHERE ph_out <> '' AND NOT phone_ok),
      emstr AS (
        SELECT comp, string_agg(em || '::' || lab, '|' ORDER BY em) AS emails,
          count(*) AS email_total,
          sum(CASE WHEN lab <> 'invalid' THEN 1 ELSE 0 END) AS email_valid
        FROM emall GROUP BY comp),
      phstr AS (
        SELECT comp, string_agg(ph || '::' || lab, '|' ORDER BY ph) AS phones,
          count(*) AS phone_total,
          sum(CASE WHEN lab <> 'invalid' THEN 1 ELSE 0 END) AS phone_valid
        FROM phall GROUP BY comp),
      wch AS (
        SELECT agg.comp,
          coalesce(ew.w, 0) + coalesce(pw.w, 0) + coalesce(aw.w, 0) AS work_channels
        FROM agg
        LEFT JOIN (SELECT comp, 1 AS w FROM emall WHERE lab = 'work' GROUP BY comp) ew USING (comp)
        LEFT JOIN (SELECT comp, 1 AS w FROM phall WHERE lab = 'work' GROUP BY comp) pw USING (comp)
        LEFT JOIN (SELECT comp, 1 AS w FROM mm
                   WHERE has_addr AND addr_label = 'work' GROUP BY comp) aw USING (comp)),
      ${byPrioritySql("department", "department")},
      nb AS (
        SELECT comp, string_agg(notes, ' | '
            ORDER BY CASE WHEN source = 'gmail' THEN 1 ELSE 2 END, k, notes) AS notes_blob
        FROM mm WHERE notes <> '' AND source <> 'linkedin' GROUP BY comp),
      base AS (
        SELECT agg.comp,
          trim(concat_ws(' ', nullif(sp.prefix, ''), bf.fname, agg.lname,
            nullif(ss.suffix, ''))) AS full_name,
          bf.fname AS first_name, agg.lname AS last_name,
          coalesce(sc.company, '') AS company,
          coalesce(st2.title, '') AS title,
          coalesce(sd.department, '') AS department,
          coalesce(sl.linkedin_url, '') AS linkedin_url,
          coalesce(emstr.emails, '') AS emails,
          coalesce(phstr.phones, '') AS phones,
          coalesce(emstr.email_total, 0) AS email_total,
          coalesce(emstr.email_valid, 0) AS email_valid,
          coalesce(phstr.phone_total, 0) AS phone_total,
          coalesce(phstr.phone_valid, 0) AS phone_valid,
          agg.n_addresses AS addr_total,
          agg.source_count, agg.source_row_count,
          wch.work_channels,
          coalesce(nb.notes_blob, '') AS notes_blob
        FROM agg
        JOIN bestfirst bf USING (comp)
        JOIN wch USING (comp)
        LEFT JOIN sel_prefix sp USING (comp)
        LEFT JOIN sel_suffix ss USING (comp)
        LEFT JOIN sel_company sc USING (comp)
        LEFT JOIN sel_title st2 USING (comp)
        LEFT JOIN sel_department sd USING (comp)
        LEFT JOIN sel_linkedin_url sl USING (comp)
        LEFT JOIN emstr USING (comp)
        LEFT JOIN phstr USING (comp)
        LEFT JOIN nb USING (comp)),
      cscore AS (
        SELECT comp,
          CAST(greatest(0, least(100,
            round(least(
              CASE WHEN email_total > 0 AND email_total = email_valid THEN 40
                   WHEN email_valid > 0 THEN 20 ELSE 0 END
              + CASE WHEN phone_total > 0 AND phone_total = phone_valid THEN 30
                     WHEN phone_valid > 0 THEN 15 ELSE 0 END
              + CASE WHEN addr_total > 0 THEN 30 ELSE 0 END, 100) * 0.4)
            + least(((CASE WHEN email_total > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN phone_total > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN addr_total > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN linkedin_url <> '' THEN 1 ELSE 0 END)) * 5, 20)
            + CASE WHEN source_count >= 3 THEN 10 WHEN source_count = 2 THEN 6 ELSE 2 END
            + CASE WHEN linkedin_url <> '' THEN 6 ELSE 0 END
            + CASE WHEN company <> '' OR title <> '' THEN 6 ELSE 0 END
            + CASE WHEN department <> '' THEN 3 ELSE 0 END
            + CASE WHEN work_channels > 0 THEN least(work_channels * 2, 6) ELSE 0 END
            + CASE WHEN email_total > 0 AND email_total = email_valid THEN 5 ELSE 0 END
            + CASE WHEN phone_total > 0 AND phone_total = phone_valid THEN 3 ELSE 0 END
            + CASE WHEN addr_total > 0 THEN 2 ELSE 0 END
            + CASE WHEN first_name <> '' AND last_name <> '' THEN 3 ELSE 0 END
            + CASE WHEN full_name <> '' THEN 2 ELSE 0 END
            - CASE WHEN email_total > 0 AND email_valid = 0 THEN 5 ELSE 0 END
            - CASE WHEN phone_total > 0 AND phone_valid = 0 THEN 4 ELSE 0 END)) AS INT)
            AS confidence_score
        FROM base),
      lochit AS (
        SELECT comp, 1 AS h FROM mm
        WHERE has_addr AND lower(trim(state_norm)) = 'ma'
          AND (lower(trim(city)) IN ('braintree','quincy','weymouth','dedham','milton','hingham')
               OR lower(trim(city)) LIKE '%braintree%' OR lower(trim(city)) LIKE '%quincy%'
               OR lower(trim(city)) LIKE '%weymouth%' OR lower(trim(city)) LIKE '%dedham%'
               OR lower(trim(city)) LIKE '%milton%' OR lower(trim(city)) LIKE '%hingham%')
        GROUP BY comp),
      domhit AS (
        SELECT comp, 1 AS h FROM emall
        WHERE em LIKE '%@%' AND (
          split_part(em, '@', 2) LIKE '%gridgain.com%'
          OR split_part(em, '@', 2) LIKE '%redhat.com%'
          OR split_part(em, '@', 2) LIKE '%tetrate.io%'
          OR split_part(em, '@', 2) LIKE '%oracle.com%'
          OR split_part(em, '@', 2) LIKE '%teamlogicit.com%')
        GROUP BY comp),
      tg AS (
        SELECT b.comp,
          regexp_matches(lower(concat_ws(' ', b.company, b.title, b.linkedin_url, b.notes_blob)),
            'tai\\s*chi|wu\\s*an|wu\\s*dao|kung\\s*fu|shaolin|martial\\s*arts') AS tm,
          regexp_matches(lower(concat_ws(' ', b.company, b.title, b.linkedin_url, b.notes_blob)),
            'nutcracker|\\bcherub(s)?\\b|jose\\s*mateo|ballet') AS tn,
          ((lower(trim(b.company)) <> '' AND (lower(b.company) LIKE '%gridgain%'
             OR lower(b.company) LIKE '%red hat%' OR lower(b.company) LIKE '%tetrate%'
             OR lower(b.company) LIKE '%redhat%' OR lower(b.company) LIKE '%oracle%'
             OR lower(b.company) LIKE '%teamlogic%'))
           OR dh.h IS NOT NULL) AS tw,
          lh.h IS NOT NULL AS tl
        FROM base b
        LEFT JOIN domhit dh USING (comp)
        LEFT JOIN lochit lh USING (comp))
      SELECT
        b.full_name, b.company, b.title, b.linkedin_url, b.emails, b.phones,
        b.source_count, b.source_row_count,
        c.confidence_score,
        coalesce(array_to_string(list_sort(list_filter([
          CASE WHEN tg.tm THEN 'martial_arts' END,
          CASE WHEN tg.tn THEN 'nutcracker_performance' END,
          CASE WHEN tg.tw THEN 'work_colleague' END,
          CASE WHEN tg.tl THEN 'local_south_shore' END],
          x -> x IS NOT NULL)), '|'), '') AS tags,
        CASE WHEN tg.tm OR tg.tn THEN 'personal'
             WHEN tg.tw OR trim(b.linkedin_url) <> '' THEN 'professional'
             WHEN tg.tl THEN 'local_referral'
             ELSE 'uncategorized' END AS relationship_category,
        b.notes_blob,
        CAST(least(100, round(c.confidence_score * 0.6
          + CASE WHEN tg.tm THEN 30 ELSE 0 END
          + CASE WHEN tg.tn THEN 25 ELSE 0 END
          + CASE WHEN tg.tw THEN 20 ELSE 0 END
          + CASE WHEN tg.tl THEN 10 ELSE 0 END)) AS INT) AS referral_priority
      FROM base b
      JOIN cscore c USING (comp)
      JOIN tg USING (comp)
      ORDER BY full_name, emails, phones, company, title, linkedin_url,
        source_count, source_row_count, confidence_score, tags,
        relationship_category, notes_blob, referral_priority"""

  /** SURVEY §3's composition requirement: consolidate → validate →
    * confidence → tag as ONE lazy Spark plan. The reference composes
    * the four stage CLIs through CSV artifacts on disk
    * (`make pipeline`, Makefile:55); here the SAME stage functions
    * (Artifacts.consolidatedContacts / Stages.validate /
    * Stages.confidence / Stages.tag) are chained in memory — no
    * intermediate file sink, Catalyst sees the whole dataflow. Tag
    * settings are the config.yaml-equivalent [[Tag.TagSettings]]
    * (mirrors q47); notes re-read from the gmail/mac_vcf raw rows
    * only, like the reference's tag stage (tag_contacts.py:85-107). */
  val q87 = Q(
    "q87_pipeline_composed",
    "consolidate→validate→confidence→tag composed as one lazy plan (no intermediate sink)",
    (s, dir) => {
      val (merged, lineage) = mergedDefault(s, dir)
      val contacts = Artifacts.consolidatedContacts(merged)
      val flattened = Artifacts.flattenedContacts(merged)
      val (report, _) = Stages.validate(contacts, flattened)
      val (confReport, _) = Stages.confidence(contacts, report, flattened)
      val notes = Synth.contacts(s, dir).toDF()
        .where(col("source") =!= "linkedin" && col("notes") =!= "")
        .select(col("source"), col("source_row_id"), col("notes").as("note"))
      val (tagged, _) = Stages.tag(contacts, lineage.toDF(), notes, confReport,
        Tag.TagSettings())
      tagged.select(
        col("full_name"), col("company"), col("title"), col("linkedin_url"),
        col("emails"), col("phones"),
        col("source_count").cast("long").as("source_count"),
        col("source_row_count").cast("long").as("source_row_count"),
        col("confidence_score").cast("int").as("confidence_score"),
        col("tags"), col("relationship_category"), col("notes_blob"),
        col("referral_priority_score").cast("int").as("referral_priority"))
        .orderBy("full_name", "emails", "phones", "company", "title",
          "linkedin_url", "source_count", "source_row_count",
          "confidence_score", "tags", "relationship_category", "notes_blob",
          "referral_priority")
    },
    Some(q87OracleSql))

  // -- q46: quality + confidence scoring --------------------------------

  private def scoredContacts(s: SparkSession, dir: String): DataFrame =
    Score.withConfidence(
      Score.withValidationMetrics(
        normalized(s, dir).toDF().withColumn("source_count", lit(1))))

  /** Shared oracle CTE computing validation + confidence columns. */
  private def oracleScoredCte: String =
    s"""${Synth.sqlNormCte},
      conf AS (
        SELECT *,
          (CASE WHEN email_total > 0 AND email_total = email_valid_count THEN 40
                WHEN email_valid_count > 0 THEN 20 ELSE 0 END
           + CASE WHEN phone_total > 0 AND phone_total = phone_valid_count THEN 30
                  WHEN phone_valid_count > 0 THEN 15 ELSE 0 END
           + CASE WHEN addr_valid_count > 0 THEN 30 ELSE 0 END) AS quality_score,
          ((CASE WHEN email_total > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN phone_total > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN addr_total > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN trim(linkedin_url) <> '' THEN 1 ELSE 0 END)) AS corroborators,
          ((CASE WHEN email_valid_count = 1 AND email_label = 'work' THEN 1 ELSE 0 END)
           + (CASE WHEN phone_valid_count = 1 AND phone_label = 'work' THEN 1 ELSE 0 END)
           + (CASE WHEN addr_total > 0 AND addr_label = 'work' THEN 1 ELSE 0 END)) AS work_channels
        FROM scontact),
      conf2 AS (
        SELECT *,
          CAST(greatest(0, least(100,
            round(least(quality_score, 100) * 0.4)
            + least(corroborators * 5, 20)
            + 2
            + CASE WHEN trim(linkedin_url) <> '' THEN 6 ELSE 0 END
            + CASE WHEN trim(company) <> '' OR trim(title) <> '' THEN 6 ELSE 0 END
            + CASE WHEN trim(department) <> '' THEN 3 ELSE 0 END
            + CASE WHEN work_channels > 0 THEN least(work_channels * 2, 6) ELSE 0 END
            + CASE WHEN email_total > 0 AND email_total = email_valid_count THEN 5 ELSE 0 END
            + CASE WHEN phone_total > 0 AND phone_total = phone_valid_count THEN 3 ELSE 0 END
            + CASE WHEN addr_valid_count > 0 THEN 2 ELSE 0 END
            + 3 + 2
            - CASE WHEN email_total = 1 AND email_valid_count = 0 THEN 5 ELSE 0 END
            - CASE WHEN phone_total = 1 AND phone_valid_count = 0 THEN 4 ELSE 0 END)) AS INT) AS confidence_score
        FROM conf),
      conf3 AS (
        SELECT *,
          CASE WHEN confidence_score >= 80 THEN 'very_high'
               WHEN confidence_score >= 60 THEN 'high'
               WHEN confidence_score >= 40 THEN 'medium'
               ELSE 'low' END AS confidence_bucket
        FROM conf2)"""

  val q46 = Q(
    "q46_quality_confidence",
    "validation counters + additive quality & confidence scores + buckets",
    (s, dir) =>
      scoredContacts(s, dir)
        .select(col("row_id").as("custkey"),
          col("email_valid_count"), col("email_total"),
          col("phone_valid_count"), col("phone_total"),
          col("addr_valid_count"), col("addr_total"),
          col("quality_score"), col("confidence_score"), col("confidence_bucket"))
        .orderBy("custkey"),
    Some(s"""WITH $oracleScoredCte
      SELECT k AS custkey,
        CAST(email_valid_count AS INT) AS email_valid_count, CAST(email_total AS INT) AS email_total,
        CAST(phone_valid_count AS INT) AS phone_valid_count, CAST(phone_total AS INT) AS phone_total,
        CAST(addr_valid_count AS INT) AS addr_valid_count, CAST(addr_total AS INT) AS addr_total,
        CAST(quality_score AS INT) AS quality_score, confidence_score, confidence_bucket
      FROM conf3 ORDER BY custkey"""))

  // -- q47: tagging + referral priority ----------------------------------

  /** Shared oracle CTE computing the tag predicates over conf3
    * (q47/q69). */
  private def oracleTaggedCte: String =
    s"""$oracleScoredCte,
      tagd AS (
        SELECT *,
          regexp_matches(lower(concat_ws(' ', company, title, linkedin_url, notes)),
            'tai\\s*chi|wu\\s*an|wu\\s*dao|kung\\s*fu|shaolin|martial\\s*arts') AS tag_martial,
          regexp_matches(lower(concat_ws(' ', company, title, linkedin_url, notes)),
            'nutcracker|\\bcherub(s)?\\b|jose\\s*mateo|ballet') AS tag_nutcracker,
          (lower(trim(company)) <> '' AND (lower(company) LIKE '%gridgain%'
             OR lower(company) LIKE '%red hat%' OR lower(company) LIKE '%redhat%'
             OR lower(company) LIKE '%oracle%' OR lower(company) LIKE '%teamlogic%'))
           OR (email_norm LIKE '%@%' AND (
             split_part(email_norm, '@', 2) LIKE '%gridgain.com%'
             OR split_part(email_norm, '@', 2) LIKE '%redhat.com%'
             OR split_part(email_norm, '@', 2) LIKE '%tetrate.io%'
             OR split_part(email_norm, '@', 2) LIKE '%oracle.com%'
             OR split_part(email_norm, '@', 2) LIKE '%teamlogicit.com%')) AS tag_work,
          has_addr AND lower(trim(state_norm)) = 'ma'
            AND (lower(trim(city)) IN ('braintree','quincy','weymouth','dedham','milton','hingham')
                 OR lower(trim(city)) LIKE '%braintree%' OR lower(trim(city)) LIKE '%quincy%'
                 OR lower(trim(city)) LIKE '%weymouth%' OR lower(trim(city)) LIKE '%dedham%'
                 OR lower(trim(city)) LIKE '%milton%' OR lower(trim(city)) LIKE '%hingham%') AS tag_local
        FROM conf3)"""

  /** Oracle text of the referral-priority score + relationship
    * category over tagd (tag_contacts.py:152-171). */
  private val oracleCategorySql =
    """CASE WHEN tag_martial OR tag_nutcracker THEN 'personal'
             WHEN tag_work OR trim(linkedin_url) <> '' THEN 'professional'
             WHEN tag_local THEN 'local_referral'
             ELSE 'uncategorized' END"""
  private val oracleReferralSql =
    """CAST(least(100, round(confidence_score * 0.6
          + CASE WHEN tag_martial THEN 30 ELSE 0 END
          + CASE WHEN tag_nutcracker THEN 25 ELSE 0 END
          + CASE WHEN tag_work THEN 20 ELSE 0 END
          + CASE WHEN tag_local THEN 10 ELSE 0 END)) AS INT)"""

  val q47 = Q(
    "q47_tags_referral",
    "keyword/rule tagging, relationship category, referral priority",
    (s, dir) =>
      Tag.withTags(scoredContacts(s, dir).withColumn("notes_blob", col("notes")))
        .select(col("row_id").as("custkey"), col("tags"),
          col("relationship_category"), col("referral_priority"))
        .orderBy("custkey"),
    Some(s"""WITH $oracleTaggedCte
      SELECT k AS custkey,
        coalesce(array_to_string(list_sort(list_filter([
          CASE WHEN tag_martial THEN 'martial_arts' END,
          CASE WHEN tag_nutcracker THEN 'nutcracker_performance' END,
          CASE WHEN tag_work THEN 'work_colleague' END,
          CASE WHEN tag_local THEN 'local_south_shore' END],
          x -> x IS NOT NULL)), '|'), '') AS tags,
        CASE WHEN tag_martial OR tag_nutcracker THEN 'personal'
             WHEN tag_work OR trim(linkedin_url) <> '' THEN 'professional'
             WHEN tag_local THEN 'local_referral'
             ELSE 'uncategorized' END AS relationship_category,
        CAST(least(100, round(confidence_score * 0.6
          + CASE WHEN tag_martial THEN 30 ELSE 0 END
          + CASE WHEN tag_nutcracker THEN 25 ELSE 0 END
          + CASE WHEN tag_work THEN 20 ELSE 0 END
          + CASE WHEN tag_local THEN 10 ELSE 0 END)) AS INT) AS referral_priority
      FROM tagd ORDER BY custkey"""))

  // -- q48: confidence bucket histogram ----------------------------------

  val q48 = Q(
    "q48_confidence_summary",
    "bucket histogram with percentages over the scored corpus",
    (s, dir) => Score.summary(scoredContacts(s, dir)),
    Some(s"""WITH $oracleScoredCte
      SELECT confidence_bucket AS bucket, count(*) AS count,
        round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS pct
      FROM conf3 GROUP BY confidence_bucket ORDER BY bucket"""))

  // -- q49: multi-format ingestion round-trip ---------------------------

  /** End-to-end exercise of the file-format readers inside the
    * correctness gate: synthesize a LinkedIn connections CSV (with
    * preamble noise) and a vCard 3.0 export from the customer table,
    * parse them back through graft.sources.Sources, and aggregate the
    * parsed fields per source. The oracle recomputes the same
    * aggregates from the same scalar derivations — any divergence in
    * header sniffing, CSV quoting, URL filtering, date parsing, TYPE
    * handling or N-line splitting breaks the hash match. */
  val q49 = Q(
    "q49_sources_roundtrip",
    "LinkedIn-CSV + vCard exports synthesized, parsed back, aggregated",
    (s, dir) => {
      import s.implicits._
      val k = col("c_custkey")
      def pick(values: Seq[String], idx: Column): Column =
        element_at(array(values.map(lit): _*), (idx + 1).cast("int"))
      val first = pick(Synth.Firsts, k % 16)
      val last = pick(Synth.Lasts, k % 20)
      val cls = (k % 400).cast("string")
      val email = when(k % 5 =!= 0,
        concat(lower(first), lit("."), lower(last), cls, lit("@example.com"))).otherwise("")
      val phone = when(k % 7 =!= 0,
        concat(lit("+1 (617) 555-"), lpad(cls, 4, "0"))).otherwise("")
      val company = when(k % 6 < 3, pick(Synth.Companies, k % 6)).otherwise("")
      val url = when(k % 10 === 7, lit("https://example.com/u"))
        .otherwise(concat(lit("https://www.linkedin.com/in/"), lower(first), lit("-"), lower(last)))
      val connected = concat(lit("2023-"), lpad((k % 12 + 1).cast("string"), 2, "0"),
        lit("-"), lpad((k % 28 + 1).cast("string"), 2, "0"))
      val customers = t(s, dir, "customer").orderBy("c_custkey")

      // Fixture synthesis is fully distributed: the CSV body and vCard
      // blocks are written as text part-files straight from executors
      // (no driver collect), with each CSV part file carrying its own
      // preamble + header — exactly what a directory of per-account
      // exports looks like, and what the preamble sniff must handle
      // per file anyway. localScratch only chooses the path (driver
      // and executors share a filesystem under local[]; a cluster
      // deployment would point this at shared storage).
      val scratch = localScratch(s, "q49", dir)
      val liDir = s"$scratch/linkedin"
      val vcfDir = s"$scratch/contacts_vcf"
      val liPreamble = "Notes:\n\"export preamble\"\n" +
        "First Name,Last Name,URL,Email Address,Company,Position,Connected On"
      customers.select(concat_ws(",", first, last, url, email,
          company, pick(Synth.Titles, k % 5), connected).as("l")).as[String]
        .mapPartitions(it => Iterator(liPreamble) ++ it)
        .write.mode("overwrite").text(liDir)
      customers.select(concat(
        lit("BEGIN:VCARD\nVERSION:3.0\nFN:"), first, lit(" "), last,
        lit("\nN:"), last, lit(";"), first, lit(";;;"),
        when(email =!= "", concat(lit("\nEMAIL;TYPE=WORK:"), email)).otherwise(""),
        when(phone =!= "", concat(lit("\nTEL;TYPE=CELL:"), phone)).otherwise(""),
        when(company =!= "", concat(lit("\nORG:"), company)).otherwise(""),
        lit("\nEND:VCARD")).as("b")).as[String]
        .write.mode("overwrite").text(vcfDir)

      graft.sources.Sources.linkedin(s, liDir)
        .unionByName(graft.sources.Sources.vcards(s, vcfDir))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n"),
          sum((col("linkedin_url") =!= "").cast("long")).as("n_urls"),
          sum(size(col("emails")).cast("long")).as("n_emails"),
          sum(size(col("phones")).cast("long")).as("n_phones"),
          countDistinct(when(col("company") =!= "", col("company"))).as("n_companies"),
          sum(length(col("full_name_raw")).cast("long")).as("name_chars"),
          sum((col("source_timestamp") =!= "").cast("long")).as("n_ts"))
        .orderBy(col("source"))
    },
    Some {
      val first = s"${Synth.Firsts.map(v => s"'$v'").mkString("[", ", ", "]")}[CAST(c_custkey % 16 AS INT) + 1]"
      val last = s"${Synth.Lasts.map(v => s"'$v'").mkString("[", ", ", "]")}[CAST(c_custkey % 20 AS INT) + 1]"
      val companies = Synth.Companies.map(v => s"'$v'").mkString("[", ", ", "]")
      s"""WITH d AS (
        SELECT c_custkey AS k, $first AS first, $last AS last,
          $first || ' ' || $last AS fn,
          CASE WHEN c_custkey % 5 <> 0
               THEN lower($first) || '.' || lower($last) || CAST(c_custkey % 400 AS VARCHAR) || '@example.com'
               ELSE '' END AS email,
          CASE WHEN c_custkey % 7 <> 0
               THEN '+1 (617) 555-' || lpad(CAST(c_custkey % 400 AS VARCHAR), 4, '0')
               ELSE '' END AS phone,
          CASE WHEN c_custkey % 6 < 3 THEN $companies[CAST(c_custkey % 6 AS INT) + 1] ELSE '' END AS company
        FROM customer)
      SELECT * FROM (
        SELECT 'linkedin' AS source, count(*) AS n,
          CAST(sum(CASE WHEN k % 10 <> 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_urls,
          CAST(sum(CASE WHEN email <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_emails,
          CAST(0 AS BIGINT) AS n_phones,
          count(DISTINCT CASE WHEN company <> '' THEN company END) AS n_companies,
          CAST(sum(length(fn)) AS BIGINT) AS name_chars,
          count(*) AS n_ts
        FROM d
        UNION ALL
        SELECT 'mac_vcf', count(*),
          CAST(0 AS BIGINT),
          CAST(sum(CASE WHEN email <> '' THEN 1 ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN phone <> '' THEN 1 ELSE 0 END) AS BIGINT),
          count(DISTINCT CASE WHEN company <> '' THEN company END),
          CAST(sum(length(fn)) AS BIGINT),
          CAST(0 AS BIGINT)
        FROM d)
      ORDER BY source"""
    })

  // -- q56b/q58: corpus validation summary ------------------------------

  /** The validate-stage stdout summary (validate_quality.py:223-233):
    * corpus totals and channel-presence percentages. */
  val q58 = Q(
    "q58_validation_summary",
    "corpus totals + has-any-channel percentages (validate stage summary)",
    (s, dir) => Score.validationSummary(scoredContacts(s, dir)),
    Some(s"""WITH ${Synth.sqlNormCte}
      SELECT count(*) AS contacts_total,
        round(sum(CASE WHEN email_total > 0 THEN 1 ELSE 0 END) * 100.0 / count(*), 2) AS has_any_email_pct,
        round(sum(CASE WHEN phone_total > 0 THEN 1 ELSE 0 END) * 100.0 / count(*), 2) AS has_any_phone_pct,
        round(sum(CASE WHEN addr_total > 0 THEN 1 ELSE 0 END) * 100.0 / count(*), 2) AS has_any_address_pct
      FROM scontact"""))

  // -- q57: invalid-channel insights ------------------------------------

  /** The insight-notebook analyses (scripts/invalid_email_insights.ipynb,
    * scripts/non_standard_phone_insights.ipynb): the invalid-email /
    * non-standard-phone side-channels, counted per value. Computed with
    * the native column forms of the email/phone validity rules (the
    * corpus has single-element collections, so the order-sensitive
    * normalization folds are identity — same reasoning the oracle
    * relies on), keeping the whole query in codegen instead of paying
    * the typed normalize pipeline. */
  val q57 = Q(
    "q57_invalid_channel_insights",
    "explode invalid_emails / non_standard_phones side-channels, count per value",
    (s, dir) => {
      val c = Synth.contacts(s, dir).toDF()
        .select(
          trim(coalesce(try_element_at(col("emails"), lit(1)).getField("value"), lit(""))).as("em"),
          trim(coalesce(try_element_at(col("phones"), lit(1)).getField("value"), lit(""))).as("ph"))
        .select(col("em"), col("ph"),
          lower(regexp_replace(col("em"), " ", "")).as("em_c"),
          regexp_replace(col("ph"), "[^0-9]", "").as("digits"))
      val emailValid = col("em_c")
        .rlike("^[A-Za-z0-9._%+\\-']+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}$")
      val e164 = when(length(col("digits")) === 10, concat(lit("+1"), col("digits")))
        .when(length(col("digits")) === 11 && col("digits").startsWith("1"),
          concat(lit("+"), col("digits")))
        .otherwise(col("ph"))
      val phoneValid = e164.startsWith("+") && length(col("digits")) >= 11
      val em = c.where(col("em") =!= "" && !emailValid)
        .select(lit("invalid_email").as("channel"), col("em").as("value"))
      val ph = c.where(col("ph") =!= "" && !phoneValid)
        .select(lit("non_standard_phone").as("channel"),
          concat(col("ph"), lit("::invalid")).as("value"))
      em.union(ph)
        .groupBy(col("channel"), col("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("channel"), col("value"))
    },
    Some(s"""WITH ${Synth.sqlNormCte}
      SELECT channel, value, n FROM (
        SELECT 'invalid_email' AS channel, trim(email_raw) AS value, count(*) AS n
        FROM snorm2 WHERE trim(email_raw) <> '' AND email_norm = ''
        GROUP BY 2
        UNION ALL
        SELECT 'non_standard_phone', trim(phone_raw) || '::invalid', count(*)
        FROM snorm2
        WHERE trim(phone_raw) <> ''
          AND NOT (phone_e164 LIKE '+%' AND length(regexp_replace(phone_raw, '[^0-9]', '', 'g')) >= 11)
        GROUP BY 2)
      ORDER BY channel, value"""))

  // -- q69/q71: insight-notebook rankings --------------------------------

  /** scripts/referral_insights.ipynb: the referral_targets ranking —
    * top referral candidates by (priority score, confidence), with
    * relationship category. The notebook displays pandas head(25);
    * here the tie order is pinned with the key so the top-k is
    * deterministic. TakeOrderedAndProject: the top-25 is computed as
    * per-partition heaps merged on the driver — no global sort at
    * scale. */
  val q69 = Q(
    "q69_referral_insights",
    "top-25 referral targets by (priority, confidence) with category",
    (s, dir) =>
      Tag.withTags(scoredContacts(s, dir).withColumn("notes_blob", col("notes")))
        .select(col("row_id").as("custkey"), col("full_name"),
          col("relationship_category"), col("referral_priority"),
          col("confidence_score"))
        .orderBy(col("referral_priority").desc, col("confidence_score").desc,
          col("custkey"))
        .limit(25),
    Some(s"""WITH $oracleTaggedCte
      SELECT k AS custkey, full_name,
        $oracleCategorySql AS relationship_category,
        $oracleReferralSql AS referral_priority,
        confidence_score
      FROM tagd
      ORDER BY referral_priority DESC, confidence_score DESC, custkey
      LIMIT 25"""))

  /** scripts/confidence_insights.ipynb: high-confidence contacts
    * (bucket ∈ {very_high, high}) ranked by confidence score. */
  val q71 = Q(
    "q71_confidence_insights",
    "top-25 high-confidence contacts by score (confidence notebook)",
    (s, dir) =>
      scoredContacts(s, dir)
        .where(col("confidence_bucket").isin("very_high", "high"))
        .select(col("row_id").as("custkey"), col("full_name"), col("company"),
          col("title"), col("confidence_score"), col("confidence_bucket"))
        .orderBy(col("confidence_score").desc, col("custkey"))
        .limit(25),
    Some(s"""WITH $oracleScoredCte
      SELECT k AS custkey, full_name, company, title,
        confidence_score, confidence_bucket
      FROM conf3 WHERE confidence_bucket IN ('very_high', 'high')
      ORDER BY confidence_score DESC, custkey LIMIT 25"""))

  val all: Seq[Q] = Seq(q40, q41, q42, q43, q44, q45, q64, q46, q47, q48,
    q49, q57, q58, q69, q71, q72)
}
