#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet views),
sorts columns by name and rows by all columns, and compares values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = bad = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet"); bad += 1; continue
        try:
            mine = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); bad += 1; continue
        if list(mine.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(mine.columns)} vs {list(want.columns)}")
            bad += 1; continue
        if len(mine) != len(want):
            print(f"FAIL {name}: rows {len(mine)} vs {len(want)}"); bad += 1; continue
        try:
            pd.testing.assert_frame_equal(mine, want, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name} ({len(mine)} rows)"); ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}"); bad += 1
    print(f"== {ok} ok, {bad} fail ==")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
