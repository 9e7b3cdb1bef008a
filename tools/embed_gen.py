#!/usr/bin/env python3
"""Deterministic embeddings-table generator for the embedding near-dup
volume run (q91/q93 at millions of vectors) — with KNOWN ground-truth
near-dup structure, so the run verifies soundness and recall, not just
wall time. The embedding twin of dedup_gen.py.

Emits <outDir>/embeddings.parquet with the TESTDATA.md schema
(vec_id BIGINT, embedding FLOAT[64], label INTEGER).

Construction: per-(entity, dim) hash noise in [-1, 1] (no RNG state),
so unrelated vectors are near-orthogonal in 64 dims (P(|cos| >= 0.8)
~ e^-20 per pair — a verify threshold of 0.8 admits no accidental
pair), while related vectors share a base direction:

- vec_id < hotN: one HOT BLOB — every vector is base direction -1
  plus a 0.02-scale tilt (pairwise cosine >= 0.999). This is the
  boilerplate-embedding pathology the q88-style bucket cap exists
  for: uncapped sign-LSH would emit ~hotN^2/2 pairs from it.
- otherwise group g = vec_id // 4, role r = vec_id % 4:
  - g % 8 == 0: a 4-vector NEAR-DUP cluster — root u_g at r = 0,
    members u_g + 0.02*noise (root<->member cosine ~0.9998,
    member<->member ~0.9996, all far above a 0.8 verify threshold).
  - g % 8 == 1, r == 1: an EXACT duplicate of vector 4g (identical
    floats; guaranteed same LSH key in every band).
  - everything else: singleton (unique direction).

For nVecs = 2M, hotN = 20k: one 20k blob, ~61.9k 4-vector clusters,
~61.9k exact-dup pairs, rest singletons.

Usage: python3 tools/embed_gen.py <outDir> <nVecs> [hotN=20000]
"""
import duckdb, os, sys


def main(out_dir, n, hot):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    base = "((hash(base_id * 131 + p) % 1048576) / 524288.0 - 1.0)"
    tilt = "((hash(vec_id * 1000003 + p * 257 + 777) % 1048576) / 524288.0 - 1.0)"
    con.execute(f"""
      COPY (
        WITH d AS (
          SELECT i AS vec_id, i // 4 AS g, i % 4 AS r FROM range(0, {n}) t(i)),
        based AS (
          SELECT vec_id,
            CASE WHEN vec_id < {hot} THEN -1
                 WHEN g % 8 = 0 THEN 4 * g
                 WHEN g % 8 = 1 AND r = 1 THEN 4 * g
                 ELSE vec_id END AS base_id,
            CASE WHEN vec_id < {hot} THEN 0.02
                 WHEN g % 8 = 0 AND r > 0 THEN 0.02
                 ELSE 0.0 END AS tilt
          FROM d)
        SELECT vec_id,
          list_transform(range(0, 64), p ->
            CAST({base} + tilt * {tilt} AS FLOAT)) AS embedding,
          CAST(vec_id % 16 AS INTEGER) AS label
        FROM based
      ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
    """)
    cnt = con.sql(
        f"SELECT count(*) FROM '{out_dir}/embeddings.parquet'").fetchone()[0]
    print(f"wrote {cnt} vectors (hot blob {hot}) to {out_dir}/embeddings.parquet")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]),
         int(sys.argv[3]) if len(sys.argv) > 3 else 20000)
