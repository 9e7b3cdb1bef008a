#!/usr/bin/env python3
"""Deterministic documents-table generator for the q53 char-4-gram
Jaccard PREFIX-FILTER volume ladder — same known ground-truth group
structure as dedup_gen.py, but tokens rendered over a 32-letter
alphabet so the char-4-gram vocabulary is as large as 4-grams allow
(~32^4 internal grams + boundary grams), far past q53's 16384 bitset
bound: the adaptive probe must select the prefix-filter path.

Ground truth (same residues as dedup_gen): group g = doc_id//4;
g%8==0 is a 4-doc near-dup cluster rooted at 4g (one token position
overwritten per member -> char-gram Jaccard 0.91-0.97, all >= q53's
0.5 threshold); g%8==1 has docs {4g, 4g+1} byte-identical (J=1.0);
everything else is a singleton sharing ~no tokens. Expected verified
pair set: EXACTLY 6 per cluster group + 1 per exact group — the
prefix filter is a sound+complete candidate filter, so the volume run
asserts equality, not a recall bound.

NOTE the density wall this ladder exists to measure: char-4-grams
live in a bounded (~2M) vocabulary, so document frequency grows
linearly with corpus size and prefix-join candidate volume grows
~n^2 regardless of corpus content. The ladder sizes (25k-200k) span
the regime where the exact join is practical; THROUGHPUT.md records
the wall arithmetic and the at-scale alternatives.

Usage: python3 tools/jaccard_gen.py <outDir> <nDocs>
"""
import duckdb, os, sys


def main(out_dir, n_docs):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    alpha = "abcdefghijklmnopqrstuvwxyz234567"
    tok = ("'w' || array_to_string(list_transform(range(0, 8), k -> "
           f"substr('{alpha}', 1 + CAST((hash(base_id * 1000003 + p) >> (5 * k)) % 32 AS INT), 1)), '')")
    con.execute(f"""
      COPY (
        WITH d AS (
          SELECT i AS doc_id, i // 4 AS g, i % 4 AS r FROM range(0, {n_docs}) t(i)),
        based AS (
          SELECT doc_id, g, r,
            CASE WHEN g % 8 = 0 THEN 4 * g
                 WHEN g % 8 = 1 AND r = 1 THEN 4 * g
                 ELSE doc_id END AS base_id,
            (g % 8 = 0 AND r > 0) AS mutated
          FROM d),
        sized AS (
          SELECT *, 60 + (base_id * 17) % 121 AS n_toks,
            CASE WHEN mutated THEN (17 * r) % (60 + (base_id * 17) % 121)
                 ELSE -1 END AS mutpos
          FROM based)
        SELECT doc_id,
          array_to_string(
            list_transform(range(0, n_toks), p ->
              CASE WHEN p = mutpos THEN 'm' || CAST(doc_id AS VARCHAR)
                   ELSE {tok}
              END), ' ') AS text,
          (['en','en','en','es','de','en','es','en'])[1 + doc_id % 8] AS lang,
          's' || CAST(doc_id % 8 AS VARCHAR) AS source,
          CAST(0 AS BIGINT) AS n_chars
        FROM sized
      ) TO '{out_dir}/documents0.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
      COPY (SELECT doc_id, text, lang, source,
              CAST(length(text) AS BIGINT) AS n_chars
            FROM '{out_dir}/documents0.parquet')
      TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
    """)
    os.remove(f"{out_dir}/documents0.parquet")
    n, = con.execute(
        f"SELECT count(*) FROM '{out_dir}/documents.parquet'").fetchone()
    print(f"wrote {n} docs -> {out_dir}/documents.parquet")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
