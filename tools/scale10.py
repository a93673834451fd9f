#!/usr/bin/env python3
"""Generate a ~10x copy of an sf directory for scale rehearsal (driver-side
tooling, like verify_local.py — NOT part of the Spark library).

Each of the N copies shifts every entity key by i*OFFSET consistently, so
joins still match within a copy and keys never collide across copies.
nation/region (shared dims) are copied once.

Two content modes for the text-bearing tables:
  default      — text/embedding payloads repeated verbatim, which
                 deliberately gives the dedup families real duplicate
                 groups to chew on.
  --diversity  — every token in documents.text is remapped per copy
                 (token -> token~i for copies i>0), so the token /
                 bigram / shingle VOCABULARY grows ~n-fold instead of
                 duplicating. This is the axis the LM model tables, BPE
                 vocab and q103 source-overlap actually grow on — the
                 round-9 verdict's "vocab-sized at scale" rehearsal gap.
                 Embedding vectors are likewise diversified: copy i
                 rotates each vector's dimensions by i (mod 64) — an
                 orthogonal transform, so WITHIN-copy geometry
                 (norms, distances, cosines) is exactly preserved while
                 cross-copy exact/near duplicates vanish, making the
                 ANN/embedding-dedup rehearsals test genuinely distinct
                 vectors instead of duplicate-heavy copies.

--tables a,b,c limits generation to those tables; every other table is
symlinked from the source dir (for documents-only 100x/1000x dirs that
only document-reading queries can use).

Usage: python3 tools/scale10.py SRC DST [n_copies] [--diversity]
                                [--tables documents,embeddings]
"""
import os
import sys

import duckdb

argv = sys.argv[1:]
diversity = "--diversity" in argv
only = None
skip = set()
for i, a in enumerate(argv):
    if a == "--tables" and i + 1 < len(argv):
        only = set(argv[i + 1].split(","))
        skip.add(i + 1)
    elif a.startswith("--tables="):
        only = set(a.split("=", 1)[1].split(","))
args = [a for i, a in enumerate(argv)
        if not a.startswith("--") and i not in skip]
src, dst = args[0], args[1]
n = int(args[2]) if len(args) > 2 else 10
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

os.makedirs(dst, exist_ok=True)
for tbl, keys in SHIFTS.items():
    if only is not None and tbl not in only:
        link = f"{dst}/{tbl}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{tbl}.parquet", link)
        print(f"{tbl}: symlinked")
        continue
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{tbl}.parquet')").fetchall()]
    if keys is None:
        sel = ", ".join(cols)
        q = f"SELECT {sel} FROM read_parquet('{src}/{tbl}.parquet')"
    else:
        def expr(c):
            if c in keys:
                return f"{c} + i * {OFF} AS {c}"
            if diversity and tbl == "documents" and c == "text":
                # copy 0 keeps the original corpus; copies i>0 suffix every
                # token, growing the vocabulary n-fold with the copy count
                return ("CASE WHEN i = 0 THEN text ELSE regexp_replace("
                        "text, '(\\S+)', '\\1~' || CAST(i AS VARCHAR), 'g') "
                        "END AS text")
            if diversity and tbl == "embeddings" and c == "embedding":
                # copy i rotates dimensions by i mod 64 — orthogonal, so
                # within-copy geometry is preserved exactly
                return ("CASE WHEN i % 64 = 0 THEN embedding ELSE "
                        "embedding[(i % 64) + 1:] || embedding[:(i % 64)] "
                        "END AS embedding")
            return c
        sel = ", ".join(expr(c) for c in cols)
        q = (f"SELECT {sel} FROM read_parquet('{src}/{tbl}.parquet'), "
             f"range({n}) t(i)")
    con.execute(f"COPY ({q}) TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
    cnt = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}/{tbl}.parquet')").fetchone()[0]
    print(f"{tbl}: {cnt} rows")

if diversity:
    v = con.execute(
        f"SELECT COUNT(DISTINCT t.tok) FROM read_parquet('{dst}/documents.parquet'), "
        "UNNEST(str_split(text, ' ')) t(tok)").fetchone()[0]
    print(f"documents distinct tokens: {v}")
