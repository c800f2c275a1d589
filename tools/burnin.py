#!/usr/bin/env python3
"""Local burn-in harness (driver-side emulation; NOT shipped in the
library). Compares Verify.scala's parquet dumps against the DuckDB
oracle SQL, the way the driver's t2 gate does: per query — row count,
schema, and exact values with columns sorted by name.

Usage: python3 tools/burnin.py [sfDir] [verifyOut]
"""
import json, math, sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

fail = ok = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fail += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fail += 1
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    problems = []
    if list(exp.columns) != list(got.columns):
        problems.append(f"columns exp={list(exp.columns)} got={list(got.columns)}")
    elif len(exp) != len(got):
        problems.append(f"rows exp={len(exp)} got={len(got)}")
    else:
        for c in exp.columns:
            ev, gv = list(exp[c]), list(got[c])
            ne = sum(1 for a, b in zip(ev, gv)
                     if canon(a) != canon(b) and not (a is None and b is None)
                     and str(a) != str(b))
            if ne:
                i = next(i for i, (a, b) in enumerate(zip(ev, gv))
                         if canon(a) != canon(b) and str(a) != str(b))
                problems.append(f"col {c}: {ne} diffs, first row {i}: exp={ev[i]!r} got={gv[i]!r}")
        # dtype check (loose: numpy dtype names)
        for c in exp.columns:
            if str(exp[c].dtype) != str(got[c].dtype):
                problems.append(f"dtype {c}: exp={exp[c].dtype} got={got[c].dtype}")
    if problems:
        print(f"FAIL {name} ({len(exp)} rows): " + "; ".join(problems[:4]))
        fail += 1
    else:
        print(f"ok   {name} ({len(exp)} rows)")
        ok += 1

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
