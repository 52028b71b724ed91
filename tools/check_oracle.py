#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify (Spark) at a given SF, then replays each oracle SQL
in DuckDB over the same parquet tables and compares values
(column-name-sorted, row-sorted) — approximating the driver's
row/schema/hash check.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
(assumes Verify already wrote outDir; pass --run to invoke sbt first)
"""
import json, os, sys, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # this sandbox's duckdb defaults to few threads; the knn-family
    # oracles are ~100x faster fully parallel at sf>=1
    con.execute(f"SET threads TO {os.cpu_count() or 4}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_bad += 1; continue
        spark = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        s = normalize(spark); d = normalize(duck)
        if list(s.columns) != list(d.columns):
            print(f"[SCHEMA] {name}: spark={list(s.columns)} duck={list(d.columns)}"); n_bad += 1; continue
        if len(s) != len(d):
            print(f"[ROWS] {name}: spark={len(s)} duck={len(d)}"); n_bad += 1; continue
        if not s.reset_index(drop=True).equals(d.reset_index(drop=True)):
            neq = (s.reset_index(drop=True) != d.reset_index(drop=True)).any(axis=1)
            print(f"[VALUES] {name}: {neq.sum()} differing rows of {len(s)}")
            both = pd.concat([s.reset_index(drop=True)[neq].head(3).add_suffix('_spark'),
                              d.reset_index(drop=True)[neq].head(3).add_suffix('_duck')], axis=1)
            print(both.to_string()); n_bad += 1; continue
        print(f"[OK] {name}: {len(s)} rows"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort")

if __name__ == "__main__":
    main()
