#!/usr/bin/env python3
"""Deterministic large embeddings-table generator for the trained-IVF
throughput run (q79/q85 at volume).

Emits <outDir>/embeddings.parquet with the TESTDATA.md schema
(vec_id BIGINT, embedding FLOAT[], label INTEGER), 64-dim like the
driver corpora. Vectors are clustered: 16 fixed hash-derived base
directions (one per vec_id % 16) plus per-(vec,dim) hash noise, so the
k-means cells the quantizer trains are real structure, not uniform
fuzz — the Lloyd steps move centroids and the cell populations are
non-degenerate. Everything is integer-hash deterministic (no RNG
state), matching the engine's no-RNG discipline.

Usage: python3 tools/ivf_gen.py <outDir> <nVecs>
"""
import duckdb, os, sys

def main():
    out_dir, n = sys.argv[1], int(sys.argv[2])
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    # h(c,p), h2(i,p): multiplicative hashes folded to [-1, 1].
    base = "((((i % 16) * 2654435761 + p * 2246822519) % 1000003) / 500001.5 - 1.0)"
    noise = "(((i * 2654435761 + p * 40503) % 1000003) / 500001.5 - 1.0)"
    con.execute(f"""
      COPY (
        SELECT i AS vec_id,
          list_transform(range(0, 64), p ->
            CAST(0.8 * {base} + 0.2 * {noise} AS FLOAT)) AS embedding,
          CAST(i % 16 AS INTEGER) AS label
        FROM range({n}) t(i)
      ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
    """)
    cnt = con.sql(f"SELECT count(*) FROM '{out_dir}/embeddings.parquet'").fetchone()[0]
    print(f"wrote {cnt} vectors to {out_dir}/embeddings.parquet")

if __name__ == "__main__":
    main()
