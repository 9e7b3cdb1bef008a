#!/usr/bin/env python3
"""Deterministic large documents-table generator for the corpus-curation
throughput run (q80-q84 at volume).

Emits <outDir>/documents.parquet with the TESTDATA.md schema
(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR,
n_chars BIGINT).

Construction is substring slicing over 16 precomputed fixed-width
"token tapes" (3-char words + single spaces, so every 4-char stride is
a word boundary) — fully vectorized in DuckDB, seconds for millions of
rows, no per-element list indexing (a first attempt with
list_transform word lookups ran ~1000x slower). Realism knobs:

- 16 tapes with different LCG word orders, doc -> tape by id: shingles
  repeat within a tape cohort (~6 % of docs) but stay UNDER q80's 20 %
  document-frequency threshold;
- 30 % of docs append one of 4 fixed 10-token boilerplate sentences:
  those shingles are the df-threshold positives;
- every doc appends a doc-unique token (d<id>) so exact/near-dup
  passes see distinct docs, plus 'the and' so q83's stopword rule has
  signal;
- token count varies 62..182 so q82's budget windows cut mid-stream.

Usage: python3 tools/curation_gen.py <outDir> <nDocs>
"""
import duckdb, os, sys

TAPE_TOKENS = 2400  # tape long enough for max offset + max doc length


def tape(k):
    words = [f"w{(k * 11 + j * j * 7 + j) % 64:02d}" for j in range(TAPE_TOKENS)]
    return " ".join(words)


def main(out_dir, n_docs):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE tapes (tid INTEGER, tape VARCHAR)")
    con.executemany("INSERT INTO tapes VALUES (?, ?)",
                    [(k, tape(k)) for k in range(16)])
    boiler = [
        "subscribe to our newsletter for updates terms and conditions apply",
        "all rights reserved contact the editor for reprint permission today",
        "click here to read more of this breaking story online now",
        "share this article on your favorite social media platform instantly",
    ]
    bl = "[" + ", ".join(f"'{b}'" for b in boiler) + "]"
    con.execute(f"""
      COPY (
        WITH d AS (
          SELECT i AS doc_id,
            CAST((i * 7) % 16 AS INTEGER) AS tid,
            60 + (i * 17) % 121 AS n_toks,
            1 + 4 * ((i * 37) % 2000) AS off
          FROM range(0, {n_docs}) t(i))
        SELECT doc_id,
          concat(substring(tape, off, 4 * n_toks - 1),
                 ' d', CAST(doc_id AS VARCHAR), ' the and',
                 CASE WHEN doc_id % 10 < 3
                   THEN ' ' || ({bl})[1 + doc_id % 4] ELSE '' END) AS text,
          (['en','en','en','es','de','en','es','en'])[1 + doc_id % 8] AS lang,
          's' || CAST(doc_id % 8 AS VARCHAR) AS source,
          CAST(0 AS BIGINT) AS n_chars
        FROM d JOIN tapes USING (tid)
      ) TO '{out_dir}/documents0.parquet' (FORMAT PARQUET)
    """)
    # n_chars backfill in a second vectorized pass.
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
