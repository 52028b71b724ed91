#!/usr/bin/env python3
"""Scale oracle for the r9 cluster-true dedup_sweep census.

DuckDB replays the content-canonical minhash PAIR relation (proven
hash-exact against dedup_minhash at sf1), then an INDEPENDENT
union-find resolves per-theta connected components and counts the
drops a corpus-wide keep-min delete would commit to — compared
against the Spark dedup_sweep rows. This sidesteps the recursive-CTE
census at clone-dense scale the same way sf1_components.py does for
dedup_clusters.

Usage: sweep_check.py SF_DIR VERIFY_OUT CANON_JSON
  SF_DIR      parquet tables (e.g. /tmp/sf1)
  VERIFY_OUT  graft.Verify output dir (needs dedup_sweep/)
  CANON_JSON  graft.ScaleOracles dump (canonical minhash SQL)
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def union_find_min_label(pairs):
    parent = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def main():
    sf_dir, out_dir, canon_path = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    canon = json.load(open(canon_path))
    pairs = con.execute(canon["dedup_minhash"]).df()
    files = sorted(glob.glob(f"{out_dir}/dedup_sweep/*.parquet"))
    spark = pd.concat([pd.read_parquet(f) for f in files]).sort_values("theta")
    ok = True
    for _, row in spark.iterrows():
        theta = int(row["theta"])
        qual = pairs[pairs["jaccard"] >= theta]
        labels = union_find_min_label(
            list(zip(qual["id1"].tolist(), qual["id2"].tolist())))
        drops = sum(1 for n, l in labels.items() if n != l)
        good = (len(qual) == int(row["n_pairs"])
                and drops == int(row["n_docs_dropped"]))
        print(f"theta={theta}: pairs spark={int(row['n_pairs'])} uf={len(qual)}"
              f"  drops spark={int(row['n_docs_dropped'])} uf={drops}"
              f"  {'OK' if good else 'MISMATCH'}")
        ok = ok and good
    print("sweep census:", "OK (cluster-true at this SF)" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
