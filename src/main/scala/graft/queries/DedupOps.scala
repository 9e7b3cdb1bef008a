package graft.queries

import graft.Q
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-deduplication operators for a large-scale training-data
  * pipeline: exact (hash-groupBy), MinHash+LSH banding, SimHash, char
  * n-gram Jaccard, and embedding-cosine near-dup. This generalizes the
  * reference's entity-resolution pipeline — blocking key → candidate
  * pairs → similarity predicate (combine_contacts.py:1116-1222) — from
  * contacts to documents: LSH band buckets replace the last-name block,
  * and set/vector similarity replaces the name-similarity score.
  *
  * Scale design (100 TB): every operator here is
  * shingle/sketch (narrow, codegen) → explode bands → shuffle on the
  * band bucket → within-bucket self-join → exact verify on the
  * candidates only. The only all-pairs work happens inside a bucket, so
  * cost is O(Σ b²) per bucket exactly like the reference's blocking, and
  * AQE's skew-join splitting handles a hot bucket. Nothing ever
  * collects to the driver; the sketches are fixed-width columns so the
  * shuffle payload is bounded (signature + id, never the document text).
  */
object DedupOps {

  private def toks(c: Column): Column = split(trim(c), " +")

  /** Distinct word 3-gram shingle set (same shingling as q34). */
  private def shingles3(c: Column): Column = {
    val tk = toks(c)
    array_distinct(transform(sequence(lit(1), size(tk) - 2),
      i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
        element_at(tk, i + 2))))
  }

  private val oShingles3 =
    """SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents)
      |  WHERE len(toks) >= 3""".stripMargin

  /** Exact dedupe: md5 fingerprint of alnum-normalized text, groupBy
    * fingerprint, keep min doc_id. Output is the per-source dedup
    * summary. At 100 TB this is one hash shuffle on the 16-byte
    * fingerprint with map-side partial aggregation — the canonical
    * exact-dedup plan. */
  val q50 = Q(
    "q50_exact_dedup",
    "per-source exact-duplicate summary via normalized-text md5 groupBy",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("source"),
          md5(lower(regexp_replace(col("text"), "[^a-zA-Z0-9]", ""))).as("fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_dups"))
        .orderBy(col("source")),
    Some("""SELECT source, count(*) AS n_docs,
        count(DISTINCT fp) AS n_unique,
        count(*) - count(DISTINCT fp) AS n_dups
      FROM (SELECT source, md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS fp FROM documents)
      GROUP BY source ORDER BY source"""))

  // MinHash parameters: 12 hash functions = 4 bands × 3 rows. With the
  // verify threshold j ≥ 0.8 the LSH S-curve gives ~(1-(1-0.8³)²)… high
  // recall at 4 bands while keeping candidate volume tiny.
  private val NumHashes = 12
  private val Bands = 4
  private val RowsPerBand = 3

  /** MinHash + LSH near-dup pairs, exact-Jaccard-verified.
    *
    * Plan: shingle → 12-wide minhash signature (narrow) → explode 4
    * band keys → self-join on (band, key) → distinct candidate pairs →
    * join shingle sets back → exact Jaccard ≥ 0.8. The band self-join is
    * the only shuffle over candidates; the final verify joins shingles
    * by doc_id (hash join on the small candidate set). */
  val q51 = Q(
    "q51_minhash_lsh",
    "MinHash(12)/LSH(4x3) candidate pairs verified at Jaccard >= 0.8",
    (s, dir) => {
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), shingles3(col("text")).as("sh"))
        .where(size(col("sh")) > 0)
      val sig = sh.select(col("doc_id"), col("sh"),
        transform(sequence(lit(0), lit(NumHashes - 1)),
          seed => array_min(transform(col("sh"),
            x => h60(concat(seed.cast("string"), lit(":"), x))))).as("sig"))
      val banded = sig.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(Bands - 1)),
          b => struct(b.as("band"),
            concat_ws(",", transform(
              slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)),
              v => v.cast("string"))).as("key")))).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sa = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val sb = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4)
            .as("jaccard"))
        .where(col("jaccard") >= 0.8)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH sh AS ($oShingles3),
      sig AS (
        SELECT doc_id, sh, list_transform(range(0, $NumHashes),
          s -> list_min(list_transform(sh,
            x -> ${oH60("CAST(s AS VARCHAR) || ':' || x")}))) AS sig
        FROM sh),
      banded AS (
        SELECT doc_id, b.b AS band,
          array_to_string(list_transform(sig[b.b*$RowsPerBand+1 : b.b*$RowsPerBand+$RowsPerBand],
            v -> CAST(v AS VARCHAR)), ',') AS key
        FROM sig, (SELECT unnest(range(0, $Bands)) AS b) b),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT doc_a, doc_b,
          round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
                CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 4) AS jaccard
        FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id
                  JOIN sh sb ON cand.doc_b = sb.doc_id)
      WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b"""))

  /** 32-bit SimHash near-dup pairs.
    *
    * Bit b of the sketch is the majority vote of bit b across the
    * 60-bit token hashes. Candidate generation blocks on the top 16
    * bits (identical prefix ⇒ hamming concentrated in the low half),
    * then verifies hamming ≤ 6 via bit_count(xor). The simhash fold is
    * a pure column expression (whole-stage codegen) — one narrow pass
    * per document, then a self-join on the 16-bit band. */
  val q52 = Q(
    "q52_simhash",
    "32-bit simhash; pairs blocked on top-16-bit band with hamming <= 6",
    (s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"),
          transform(array_distinct(toks(col("text"))), tk => h60(tk)).as("th"))
        .where(size(col("th")) > 0)
        // MSB-first fold: acc*2 + majority-bit(b), b = 31..0.
        .withColumn("simhash", expr(
          """aggregate(sequence(31, 0, -1), 0L, (acc, b) ->
            |  acc * 2L + (CASE WHEN 2 * size(filter(th, h -> (shiftright(h, b) % 2) = 1)) > size(th)
            |              THEN 1L ELSE 0L END))""".stripMargin))
        .select(col("doc_id"), col("simhash"),
          expr("shiftright(simhash, 16)").as("band"))
      base.as("a").join(base.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").as("hamming"))
        .where(col("hamming") <= 6)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH th AS (
        SELECT doc_id, list_transform(list_distinct(string_split_regex(trim(text), ' +')),
          tk -> ${oH60("tk")}) AS th
        FROM documents WHERE len(string_split_regex(trim(text), ' +')) > 0),
      sig AS (
        SELECT doc_id,
          list_aggregate(list_transform(range(0, 32),
            b -> CASE WHEN 2 * len(list_filter(th, h -> ((h >> b) & 1) = 1)) > len(th)
                 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END), 'sum') AS simhash
        FROM th),
      base AS (SELECT doc_id, simhash, simhash >> 16 AS band FROM sig)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      FROM base a JOIN base b ON a.band = b.band AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
      ORDER BY doc_a, doc_b"""))

  /** Character 4-gram Jaccard: top-20 most-similar within-language
    * pairs. The lang column is the blocking key (the all-pairs join
    * never crosses languages); the scale path for an unblocked corpus
    * is q51's LSH banding — this query is the exact-verify primitive. */
  val q53 = Q(
    "q53_ngram_jaccard",
    "char-4-gram Jaccard, top-20 within-language pairs",
    (s, dir) => {
      val norm = lower(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), norm.as("t"))
        .where(length(col("t")) >= 4)
        .select(col("doc_id"), col("lang"),
          array_distinct(transform(sequence(lit(1), length(col("t")) - 3),
            i => col("t").substr(i, lit(4)))).as("g"))
      grams.as("a").join(grams.as("b"),
          col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          round(size(array_intersect(col("a.g"), col("b.g"))).cast("double") /
            size(array_union(col("a.g"), col("b.g"))).cast("double"), 4)
            .as("jaccard"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(20)
    },
    Some("""WITH g AS (
        SELECT doc_id, lang,
          list_distinct(list_transform(range(1, length(t) - 2), i -> substring(t, i, 4))) AS g
        FROM (SELECT doc_id, lang, lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS t FROM documents)
        WHERE length(t) >= 4)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
              CAST(len(list_distinct(a.g || b.g)) AS DOUBLE), 4) AS jaccard
      FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
      ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20"""))

  /** Embedding-cosine near-dup: sign-LSH blocking (axis-aligned
    * hyperplanes at dims 1/17/33/49 → 16 buckets) then exact cosine
    * within bucket. Sign-concordant near-identical vectors always
    * collide, so recall loss only affects borderline pairs — the
    * classic random-hyperplane LSH trade. Dot/norm are index-wise
    * double folds, evaluated in the same sequential order as the
    * oracle so the doubles agree bit-for-bit. */
  val q54 = Q(
    "q54_embedding_neardup",
    "sign-LSH-bucketed embedding pairs with cosine >= 0.35",
    (s, dir) => {
      val dot = (x: Column, y: Column) =>
        aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("norm", sqrt(dot(col("v"), col("v"))))
        .withColumn("bucket", concat(
          when(element_at(col("v"), 1) >= 0, "1").otherwise("0"),
          when(element_at(col("v"), 17) >= 0, "1").otherwise("0"),
          when(element_at(col("v"), 33) >= 0, "1").otherwise("0"),
          when(element_at(col("v"), 49) >= 0, "1").otherwise("0")))
      e.as("a").join(e.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 4)
            .as("cosine"))
        .where(col("cosine") >= 0.35)
        .orderBy(col("vec_a"), col("vec_b"))
    },
    Some("""WITH e AS (
        SELECT vec_id, embedding AS v,
          sqrt(list_aggregate(list_transform(range(1, len(embedding) + 1),
            i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum')) AS norm,
          (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
           CASE WHEN embedding[17] >= 0 THEN '1' ELSE '0' END ||
           CASE WHEN embedding[33] >= 0 THEN '1' ELSE '0' END ||
           CASE WHEN embedding[49] >= 0 THEN '1' ELSE '0' END) AS bucket
        FROM embeddings)
      SELECT vec_a, vec_b, cosine FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          round(list_aggregate(list_transform(range(1, len(a.v) + 1),
            i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)), 'sum') /
            (a.norm * b.norm), 4) AS cosine
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      WHERE cosine >= 0.35 ORDER BY vec_a, vec_b"""))

  val all: Seq[Q] = Seq(q50, q51, q52, q53, q54)
}
