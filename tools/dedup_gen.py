#!/usr/bin/env python3
"""Deterministic documents-table generator for the near-dup dedup
throughput run (q50/q51/q52/q73 at volume) — with KNOWN ground-truth
cluster structure, so the volume run verifies soundness and recall,
not just wall time.

Emits <outDir>/documents.parquet with the TESTDATA.md schema
(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR,
n_chars BIGINT).

Construction: tokens are hash-derived from a per-doc BASE id, so
unrelated docs share essentially no 3-token shingles (vocab 2^20,
~125 tokens/doc -> cross-doc shingle collisions ~0), while related
docs share the base's token stream exactly:

- group g = doc_id // 4, role r = doc_id % 4;
- g % 8 == 0: a 4-doc NEAR-DUP cluster. All four docs render base
  4g's stream; roles 1..3 overwrite ONE position ((17*r) % n_toks)
  with a doc-unique token. Root<->member Jaccard on 3-shingles is
  (s-3)/(s+3) >= 0.90 at the minimum doc length (s = n_toks-2),
  member<->member (s-6)/(s+6) >= 0.81 — all above q51's 0.8 verify
  threshold, so the expected q73 cluster is {4g..4g+3} with
  canonical 4g. LSH recall at 4 bands x 3 rows is 1-(1-j^3)^4
  (>= 99.5% per root edge), NOT 1.0 by construction — the bench
  asserts soundness exactly and recall >= 98%.
- g % 8 == 1, r == 1: an EXACT duplicate of doc 4g (byte-identical
  text; q50's fingerprint path and a guaranteed j=1.0 LSH pair).
- everything else: singleton (unique base stream).

For nDocs = 2M: 62,500 4-doc near-dup clusters (250k docs), 62,500
exact-dup pairs, ~1.69M singletons.

Usage: python3 tools/dedup_gen.py <outDir> <nDocs>
"""
import duckdb, os, sys


def main(out_dir, n_docs, cluster_every=8):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
      COPY (
        WITH d AS (
          SELECT i AS doc_id, i // 4 AS g, i % 4 AS r FROM range(0, {n_docs}) t(i)),
        based AS (
          SELECT doc_id, g, r,
            CASE WHEN g % {cluster_every} = 0 THEN 4 * g
                 WHEN g % {cluster_every} = 1 AND r = 1 THEN 4 * g
                 ELSE doc_id END AS base_id,
            (g % {cluster_every} = 0 AND r > 0) AS mutated
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
                   ELSE 't' || CAST(hash(base_id * 1000003 + p) % 1048576 AS VARCHAR)
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
    n, toks = con.execute(
        f"SELECT count(*), sum(len(string_split(text, ' '))) "
        f"FROM '{out_dir}/documents.parquet'").fetchone()
    print(f"wrote {n} docs, ~{toks} tokens -> {out_dir}/documents.parquet")


if __name__ == "__main__":
    # Optional third arg spaces the dup structure out: every
    # `clusterEvery`-th 4-doc group is a near-dup cluster (default 8,
    # ~19% of docs in candidate pairs; 128 gives the ~1% candidate
    # density a production corpus shows — the ProfQ51 sparse A/B).
    main(sys.argv[1], int(sys.argv[2]),
         int(sys.argv[3]) if len(sys.argv) > 3 else 8)
