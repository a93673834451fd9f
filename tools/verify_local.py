#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle comparator (dev tool only —
not part of the Scala library). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out [query ...]

Registers each testdata parquet as a DuckDB view, runs every oracle SQL
from oracle_sql.json, and compares against the Spark-written parquet:
row count, column names (sorted), and exact cell values in row order.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = [[canon(v) for _, v in sorted(zip(got.columns, r))] for r in got.fetchall()]
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [[canon(v) for _, v in sorted(zip(exp.columns, r))] for r in exp.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        got_types = dict(zip(got.columns, [str(t) for t in got.types]))
        exp_types = dict(zip(exp.columns, [str(t) for t in exp.types]))
        type_diffs = {k: (got_types.get(k), exp_types.get(k))
                      for k in set(got_types) | set(exp_types)
                      if got_types.get(k) != exp_types.get(k)}
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns spark={got_cols} oracle={exp_cols}")
            n_fail += 1
        elif type_diffs:
            print(f"FAIL {name}: dtypes {type_diffs}")
            n_fail += 1
        elif len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            n_fail += 1
        elif got_rows != exp_rows:
            bad = next(i for i, (a, b) in enumerate(zip(got_rows, exp_rows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad} (cols {exp_cols})")
            print(f"  spark : {got_rows[bad]}")
            print(f"  oracle: {exp_rows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
