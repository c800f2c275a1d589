#!/usr/bin/env python3
"""Local DuckDB timing harness (driver-side emulation; NOT shipped in
the library). Times every oracle SQL from a Verify dump against the
same parquet tables Bench reads, min-of-3 per query — the DuckDB side
of the bench comparison on identical hardware.

Usage: python3 tools/ducktime.py [sfDir] [verifyOut] [threads]
"""
import json, sys, time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
THREADS = sys.argv[3] if len(sys.argv) > 3 else "32"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.sql(f"SET threads={THREADS}")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
times = {}
for name in sorted(oracle):
    best = None
    for _ in range(3):
        t0 = time.time()
        con.sql(oracle[name]).fetchall()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    times[name] = round(best, 4)

total = sum(times.values())
print(json.dumps({
    "metric": "duckdb_total", "value": round(total, 2), "unit": "sec",
    "n_queries": len(times), "threads": THREADS, "sf": SF,
    "queries": times}))
print(json.dumps({"metric": "duckdb_total", "value": round(total, 2),
                  "n_queries": len(times)}))
