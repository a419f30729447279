#!/usr/bin/env python3
"""Dev-only correctness harness (mirrors the driver's DuckDB oracle compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark output) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views named after the
testdata tables. Compares (a) schema column names, (b) row counts, (c) values
after sorting columns by name and rows by all columns.

This file is a development tool only — it is NOT part of the shipped Spark
library (the library is pure Scala).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        files = glob.glob(spark_glob)
        if not files:
            print(f"FAIL {name}: no spark output at {spark_glob}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: cols {gcols} != {wcols}")
            n_fail += 1
            continue
        got, want = got[gcols], want[wcols]
        got = got.sort_values(gcols, kind="mergesort").reset_index(drop=True)
        want = want.sort_values(wcols, kind="mergesort").reset_index(drop=True)
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # exact value compare (incl. dtype-insensitive via string repr)
        diff_cols = []
        for c in gcols:
            a, b = got[c], want[c]
            try:
                eq = (a.astype(str) == b.astype(str)).all()
            except Exception:
                eq = False
            if not eq:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                mask = got[c].astype(str) != want[c].astype(str)
                print("  spark:", got[mask][c].head(3).tolist())
                print("  duck :", want[mask][c].head(3).tolist())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
