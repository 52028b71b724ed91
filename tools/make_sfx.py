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
        if t == "documents":
            planted = planted_rare_docs(base.schema)
            out = pa.concat_tables([out, planted])
            print(f"documents: +{planted.num_rows} planted rare-shingle docs")
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows}")


def planted_rare_docs(schema):
    """A handful of CROSS-CLONE near-duplicate pairs built from made-up
    rare tokens. Clone replication multiplies every base shingle's df
    by the copy count, emptying dedup_ngram's rare-band (df <= 20)
    candidate channel — agreement stayed exact but proved nothing. The
    planted pairs share long runs of corpus-unique shingles (df == 2
    after planting), so the rare channel produces real candidates at
    the synthesized SF and the cross-engine comparison is informative.
    Deterministic content; ids far above any per-copy offset range.
    """
    rows = []
    for i in range(4):
        shared = " ".join(f"qz{i}w{j}" for j in range(24))
        a = f"plantedlead{i}a {shared} plantedtail{i}a"
        b = f"plantedlead{i}b {shared} plantedtail{i}b plantedextra{i}b"
        for suffix, text in (("0", a), ("1", b)):
            rows.append({
                "doc_id": 99_000_000 + i * 2 + int(suffix),
                "text": text,
                "lang": "en",
                "source": f"planted{i % 2}",
                "n_chars": len(text),
            })
    return pa.Table.from_pylist(rows, schema=schema)


if __name__ == "__main__":
    main()
