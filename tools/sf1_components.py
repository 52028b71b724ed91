#!/usr/bin/env python3
"""sf1 oracle for the recursive-CTE trio (SURVEY §5).

DuckDB cannot afford the recursive min-label propagation over the
clone-dense doc pair graph at sf1, but the PAIR RELATIONS replay
hash-exact (content-canonical minhash; literal embedding pairs), and
connected components over a verified pair list is pure integer graph
work. This script runs an INDEPENDENT union-find (min-label) over the
DuckDB-produced pairs and compares against the Spark outputs:

  dedup_clusters           <- union-find over canonical minhash pairs
  dedup_semantic_clusters  <- union-find over literal embedding pairs
  corpus_curate            <- the literal oracle SQL with ONLY the
                              recursive nd arm swapped for the
                              union-find labels (everything else,
                              including the decontamination shingle
                              arm, runs as written)

Usage: sf1_components.py SF_DIR VERIFY_OUT CANON_JSON
  SF_DIR      parquet tables (e.g. /tmp/sf1)
  VERIFY_OUT  graft.Verify output incl. oracle_sql.json
  CANON_JSON  graft.ScaleOracles dump (canonical minhash SQL)
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def union_find_min_label(pairs):
    """Min-label connected components: returns {node: min id of its
    component} over every node appearing in `pairs`."""
    parent = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min root wins -> final root IS the component minimum
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def spark_df(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise SystemExit(f"[MISS] {name}: no spark output in {out_dir}")
    return pd.concat([pd.read_parquet(f) for f in files])


def compare(name, spark, duck):
    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
            else:
                df[c] = pd.to_numeric(df[c]).astype("int64") if str(df[c].dtype).startswith("int") else df[c]
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    s, d = norm(spark), norm(duck)
    if list(s.columns) != list(d.columns):
        print(f"[SCHEMA] {name}: spark={list(s.columns)} oracle={list(d.columns)}")
        return False
    if len(s) != len(d):
        print(f"[ROWS] {name}: spark={len(s)} oracle={len(d)}")
        return False
    if not s.equals(d):
        neq = (s != d).any(axis=1)
        print(f"[VALUES] {name}: {neq.sum()} differing rows of {len(s)}")
        print(pd.concat([s[neq].head(3).add_suffix("_spark"),
                         d[neq].head(3).add_suffix("_oracle")], axis=1).to_string())
        return False
    print(f"[OK] {name}: {len(s)} rows")
    return True


def labels_df(pairs, node_col):
    lab = union_find_min_label(pairs)
    return pd.DataFrame(
        {node_col: sorted(lab),
         "keep_id": [lab[x] for x in sorted(lab)],
         "is_dup": [int(x != lab[x]) for x in sorted(lab)]})


def main():
    sf_dir, out_dir, canon_path = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 4}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    canon = json.load(open(canon_path))
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = 0

    # lexical pairs (content-canonical minhash, threshold 0.5 = the
    # clusters default) -> components
    mh = con.execute(canon["dedup_minhash"]).df()
    lex = labels_df(zip(mh["id1"], mh["id2"]), "doc_id")
    ok += compare("dedup_clusters", spark_df(out_dir, "dedup_clusters"), lex)

    # semantic pairs (literal embedding-pair oracle, sf1-feasible) ->
    # components
    ep = con.execute(oracles["dedup_embedding"]).df()
    sem = labels_df(zip(ep["id1"], ep["id2"]), "vec_id")
    ok += compare("dedup_semantic_clusters",
                  spark_df(out_dir, "dedup_semantic_clusters"), sem)

    # corpus_curate / curation_funnel: swap ONLY the recursive nd arm
    # for the union-find labels; every other arm runs as written
    con.register("nd_labels", lex[lex["is_dup"] == 1][["doc_id"]])
    n = 2
    for q in ("corpus_curate", "curation_funnel"):
        # a missing expected query is a FAILURE of the sweep, not a
        # silent pass: count it and say so
        if q not in oracles:
            n += 1
            print(f"[SKIP] {q}: no oracle SQL entry in {out_dir}/oracle_sql.json")
            continue
        if not glob.glob(f"{out_dir}/{q}/*.parquet"):
            n += 1
            print(f"[SKIP] {q}: no spark output under {out_dir}/{q}")
            continue
        n += 1
        cc = oracles[q]
        try:
            start = cc.index("), nd AS (")
            end = cc.index("), cont AS (")
        except ValueError:
            print(f"[SKIP] {q}: nd-arm markers not found in oracle SQL "
                  "(the CTE layout changed; update the splice anchors)")
            continue
        patched = cc[:start] + "), nd AS (\n  SELECT doc_id FROM nd_labels\n" + cc[end:]
        ok += compare(q, spark_df(out_dir, q), con.execute(patched).df())

    print(f"\n{ok} ok, {n - ok} bad")
    sys.exit(0 if ok == n else 1)


if __name__ == "__main__":
    main()
