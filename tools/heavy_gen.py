#!/usr/bin/env python3
"""Deterministic documents-table generator for the q106 heavy-hitter
volume run: HIGH-cardinality shingles with a provable heavy set.

curation_gen.py's corpus is wrong for this measurement in both
directions: its 64-word vocabulary caps distinct 3-gram shingles at
262k (so Spark's map-side combine collapses the full groupBy to a
trivial shuffle — nothing for the sketch to beat) AND its 16 tape
cohorts each put ~245k occurrences on every tape shingle (so the
"heavy" set is dominated by tape noise, not the planted boilerplate).

This generator fixes both with the same two knobs:

- 1024 tapes over a 100k-word vocabulary ('w%05d', fixed 7-char
  stride so substring slicing stays word-aligned): ~8M distinct tape
  shingles, each occurring ~29 times (docs-per-cohort 2M/1024 ~ 1953
  x window-coverage ~120/8000) — three orders of magnitude under the
  n/4096 ~ 60k heavy threshold;
- every doc ends with a doc-unique token ' d<id>' BEFORE the optional
  boilerplate, so every junction shingle contains d<id> and is
  doc-unique: ~6M more distinct singletons.

30 % of docs (doc_id % 10 < 3) append one of 4 fixed 10-token
boilerplate sentences (sentence 1 + doc_id % 4). The ONLY shingles
over the threshold are therefore the 33 (8+8+9+8) interior 3-grams of
those sentences, with exactly computable counts: per 20 consecutive ids the
sentences are drawn (2, 1, 2, 1) times, i.e. (n/10, n/20, n/10, n/20)
occurrences for every interior shingle of sentences (1, 2, 3, 4).
HeavyVolBench asserts that heavy set and those counts exactly.

Usage: python3 tools/heavy_gen.py <outDir> <nDocs>
"""
import duckdb, os, sys

TAPE_TOKENS = 8200  # max offset 8000 + max doc length 181
N_TAPES = 1024

BOILER = [
    "subscribe to our newsletter for updates terms and conditions apply",
    "all rights reserved contact the editor for reprint permission today",
    "click here to read more of this breaking story online now",
    "share this article on your favorite social media platform instantly",
]


def tape(k):
    words = [f"w{(k * 7919 + j * j * 31 + j) % 100000:05d}"
             for j in range(TAPE_TOKENS)]
    return " ".join(words)


def main(out_dir, n_docs):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE tapes (tid INTEGER, tape VARCHAR)")
    con.executemany("INSERT INTO tapes VALUES (?, ?)",
                    [(k, tape(k)) for k in range(N_TAPES)])
    bl = "[" + ", ".join(f"'{b}'" for b in BOILER) + "]"
    con.execute(f"""
      COPY (
        WITH d AS (
          SELECT i AS doc_id,
            CAST((i * 7) % {N_TAPES} AS INTEGER) AS tid,
            60 + (i * 17) % 121 AS n_toks,
            1 + 7 * ((i * 37) % 8000) AS off
          FROM range(0, {n_docs}) t(i))
        SELECT doc_id,
          concat(substring(tape, off, 7 * n_toks - 1),
                 ' d', CAST(doc_id AS VARCHAR),
                 CASE WHEN doc_id % 10 < 3
                   THEN ' ' || ({bl})[1 + doc_id % 4] ELSE '' END) AS text,
          (['en','en','en','es','de','en','es','en'])[1 + doc_id % 8] AS lang,
          's' || CAST(doc_id % 8 AS VARCHAR) AS source,
          CAST(0 AS BIGINT) AS n_chars
        FROM d JOIN tapes USING (tid)
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
    main(sys.argv[1], int(sys.argv[2]))
