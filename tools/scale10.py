#!/usr/bin/env python3
"""Generate a ~10x copy of an sf directory for scale rehearsal (driver-side
tooling, like verify_local.py — NOT part of the Spark library).

Each of the N copies shifts every entity key by i*OFFSET consistently, so
joins still match within a copy and keys never collide across copies.
nation/region (shared dims) are copied once. Text/embedding payloads are
repeated verbatim — which deliberately gives the dedup families real
duplicate groups to chew on.

Usage: python3 tools/scale10.py /root/testdata/sf0.1 /tmp/sf1ish [n_copies]
"""
import sys

import duckdb

src, dst = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 100_000_000

con = duckdb.connect()
con.execute("SET threads TO 16")

# table -> columns to shift per copy
SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["user_id", "event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": None,  # copy once
    "region": None,
}

import os

os.makedirs(dst, exist_ok=True)
for tbl, keys in SHIFTS.items():
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{tbl}.parquet')").fetchall()]
    if keys is None:
        sel = ", ".join(cols)
        q = f"SELECT {sel} FROM read_parquet('{src}/{tbl}.parquet')"
    else:
        sel = ", ".join(
            f"{c} + i * {OFF} AS {c}" if c in keys else c for c in cols)
        q = (f"SELECT {sel} FROM read_parquet('{src}/{tbl}.parquet'), "
             f"range({n}) t(i)")
    con.execute(f"COPY ({q}) TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
    cnt = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}/{tbl}.parquet')").fetchone()[0]
    print(f"{tbl}: {cnt} rows")
