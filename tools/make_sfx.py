#!/usr/bin/env python3
"""Synthesize a larger SF by replicating an existing SF N times with
key-space offsets (referential integrity preserved: every foreign key
gets the same per-copy offset as its target's primary key). Dimension
tables (region, nation) are shared, not replicated. Text/embedding
content is intentionally IDENTICAL across copies — a deliberately
harsher corpus for the hot-bucket / salted paths than fresh uniform
data would be.

Usage: python3 tools/make_sfx.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

OFF = 10_000_000  # per-copy key offset, far above any base key

# table -> columns that carry a key-space offset per copy
KEYED = {
    "customer":   ["c_custkey"],
    "supplier":   ["s_suppkey"],
    "part":       ["p_partkey"],
    "orders":     ["o_orderkey", "o_custkey"],
    "lineitem":   ["l_orderkey", "l_partkey", "l_suppkey"],
    "events":     ["event_id", "user_id"],
    "documents":  ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]


def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    for t in SHARED:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl, f"{dst}/{t}.parquet")
        print(f"{t}: shared {tbl.num_rows}")
    for t, keys in KEYED.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        copies = []
        for c in range(n):
            tbl = base
            if c > 0:
                for k in keys:
                    i = tbl.schema.get_field_index(k)
                    shifted = pc.add(tbl.column(k), pa.scalar(c * OFF, tbl.schema.field(k).type))
                    tbl = tbl.set_column(i, tbl.schema.field(k), shifted)
            copies.append(tbl)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
