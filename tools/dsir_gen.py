#!/usr/bin/env python3
"""Deterministic documents-table generator for the q108 DSIR volume
run: a corpus with a SEMANTIC target domain and planted in-domain raw
docs, so importance-weight selection has checkable ground truth (the
registered q108's h60 split is deterministic but semantically flat —
target and raw draw from the same distribution, so scores are noise by
construction; selection quality needs a corpus where the target
differs).

Every doc's base text is a high-cardinality tape slice (heavy_gen's
1024-tape / 100k-word construction — base bigrams spread ~29
occurrences over ~8M distinct, i.e. near-uniform over the 8192 hash
buckets). DOMAIN-B docs additionally append 20 motif pairs from a
16-pair inventory ('m0 m1' .. 'm30 m31', rotated by doc_id) — the
Zipf head that real language has and DSIR's hashed model keys on:
those ~48 distinct motif bigrams concentrate millions of occurrences
on a handful of buckets, which is exactly the bucket skew the
log-likelihood ratio detects.

Split by doc_id % 100:
  - 97 residues (0..96): lang='en', base text only  (out-of-domain raw)
  - 2  residues (97,98): lang='es', base + motifs   (the TARGET domain)
  - 1  residue  (99):    lang='en', base + motifs   (PLANTED in-domain raw)

Ground truth: with target = (lang = 'es'), the top raw docs by DSIR
score must all be residue-99 docs. DsirVolBench asserts top-1000 ⊆
planted and reports the score separation.

Usage: python3 tools/dsir_gen.py <outDir> <nDocs>
"""
import duckdb, os, sys

TAPE_TOKENS = 8200
N_TAPES = 1024
N_PAIRS = 16  # motif inventory: (m0 m1), (m2 m3), ... (m30 m31)
N_REPS = 20   # motif pairs appended per domain-B doc


def tape(k):
    words = [f"a{(k * 7919 + j * j * 31 + j) % 100000:05d}"
             for j in range(TAPE_TOKENS)]
    return " ".join(words)


def motif_suffix(rot):
    pairs = [f"m{2 * ((rot + j) % N_PAIRS)} m{2 * ((rot + j) % N_PAIRS) + 1}"
             for j in range(N_REPS)]
    return " " + " ".join(pairs)


def main(out_dir, n_docs):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE tapes (tid INTEGER, tape VARCHAR)")
    con.executemany("INSERT INTO tapes VALUES (?, ?)",
                    [(k, tape(k)) for k in range(N_TAPES)])
    con.execute("CREATE TABLE motifs (rot INTEGER, suf VARCHAR)")
    con.executemany("INSERT INTO motifs VALUES (?, ?)",
                    [(r, motif_suffix(r)) for r in range(N_PAIRS)])
    con.execute(f"""
      COPY (
        WITH d AS (
          SELECT i AS doc_id,
            CAST((i * 7) % {N_TAPES} AS INTEGER) AS tid,
            CAST(i % {N_PAIRS} AS INTEGER) AS rot,
            i % 100 AS res,
            60 + (i * 17) % 121 AS n_toks,
            1 + 7 * ((i * 37) % 8000) AS off
          FROM range(0, {n_docs}) t(i))
        SELECT doc_id,
          concat(substring(tape, off, 7 * n_toks - 1),
                 CASE WHEN res >= 97 THEN suf ELSE '' END) AS text,
          CASE WHEN res IN (97, 98) THEN 'es' ELSE 'en' END AS lang,
          's' || CAST(doc_id % 8 AS VARCHAR) AS source,
          CAST(0 AS BIGINT) AS n_chars
        FROM d JOIN tapes USING (tid) JOIN motifs USING (rot)
      ) TO '{out_dir}/documents0.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
      COPY (SELECT doc_id, text, lang, source,
              CAST(length(text) AS BIGINT) AS n_chars
            FROM '{out_dir}/documents0.parquet')
      TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
    """)
    os.remove(f"{out_dir}/documents0.parquet")
    n, es, planted = con.execute(
        f"SELECT count(*), sum(CASE WHEN lang='es' THEN 1 ELSE 0 END), "
        f"sum(CASE WHEN doc_id % 100 = 99 THEN 1 ELSE 0 END) "
        f"FROM '{out_dir}/documents.parquet'").fetchone()
    print(f"wrote {n} docs ({es} target 'es', {planted} planted in-domain raw) "
          f"-> {out_dir}/documents.parquet")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
