#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each Spark result parquet written by graft.Verify, runs the
corresponding oracle SQL in DuckDB over the same source tables, sorts
columns by name, and compares schema + values.
"""
import duckdb, glob, json, sys

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
            du = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        sp = sp[sorted(sp.columns)]
        du = du[sorted(du.columns)]
        if list(sp.columns) != list(du.columns):
            print(f"FAIL {name}: columns {list(sp.columns)} vs {list(du.columns)}"); n_bad += 1; continue
        if [str(d) for d in sp.dtypes] != [str(d) for d in du.dtypes]:
            print(f"WARN {name}: dtypes {list(map(str, sp.dtypes))} vs {list(map(str, du.dtypes))}")
        if len(sp) != len(du):
            print(f"FAIL {name}: rows {len(sp)} vs {len(du)}"); n_bad += 1; continue
        mismatch = None
        for c in sp.columns:
            a, b = sp[c].tolist(), du[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y and str(x) != str(y):
                    mismatch = (c, i, x, y); break
            if mismatch: break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} duckdb={y!r}"); n_bad += 1
        else:
            print(f"OK   {name} ({len(sp)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
