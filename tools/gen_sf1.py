#!/usr/bin/env python3
"""Generate an sf1-scale fixture by deterministic 10x replication of sf0.1.

The driver ships sf{0.001,0.01,0.1}; round 12 adds a correctness leg one
decade up (r11 verdict #5: the sf0.1 gate caught real divergences in
rounds 6, 7 and 11 — another decade is the cheapest remaining lever for
the boundary-fork class). Since /root/testdata is read-only, this script
derives sf1 locally: every table's rows are replicated REPLICAS times
with ALL key columns offset by replica * 10^10 — one uniform offset, so
every cross-table key relationship (orders<->lineitem, customer<->orders,
documents<->embeddings, events<->users) is preserved inside each replica,
and key mod-10 classes (the incremental family's drop split) are
untouched. Non-key values pass through verbatim: the compare is
Spark-vs-DuckDB over the SAME parquet, so self-consistency — not
distribution novelty — is what the leg tests, at 10x the row counts,
group cardinalities, and count/floor boundaries.

region/nation are dimension tables of fixed cardinality and are copied
unscaled (facts in every replica reference the same nation keys, exactly
like TPC-H's fixed dims).

Usage: python3 tools/gen_sf1.py [src=/root/testdata/sf0.1] \
         [dst=/tmp/graft_sf1] [replicas=10]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000_000  # preserves key % 10 classes; 9 replicas stay < 2^63

KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for t, keys in KEYS.items():
    src, dst = f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet"
    if not keys:
        sql = f"SELECT * FROM read_parquet('{src}')"
    else:
        repl = ", ".join(
            f"CAST({k} + (r.r * {OFF}) AS BIGINT) AS {k}" for k in keys)
        sql = (f"SELECT * REPLACE ({repl}) "
               f"FROM read_parquet('{src}'), range({REPLICAS}) r(r)")
    con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"sf1 fixture at {DST}")
