#!/usr/bin/env python3
"""Partitioning-invariance check: two Verify output dirs (produced with
different SPARK_GRAFT_CPUS / shuffle-partition settings) must contain
value-identical results for every query — the determinism SURVEY §7.3
promises and the driver's hash compare silently depends on. Usage:
  python3 tools/partcheck.py <dirA> <dirB>
"""
import sys, os, json
import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]
names = sorted(d for d in os.listdir(a_dir)
               if os.path.isdir(os.path.join(a_dir, d)))
assert names, f"no query dumps under {a_dir}"
fails = []
for n in names:
    pa = os.path.join(a_dir, n); pb = os.path.join(b_dir, n)
    if not os.path.isdir(pb):
        fails.append((n, "missing in B")); continue
    da, db = pd.read_parquet(pa), pd.read_parquet(pb)
    # the driver's canonicalization: column-name order, then row sort
    da = da.reindex(sorted(da.columns), axis=1)
    db = db.reindex(sorted(db.columns), axis=1)
    da = da.sort_values(by=list(da.columns), ignore_index=True)
    db = db.sort_values(by=list(db.columns), ignore_index=True)
    if not da.equals(db):
        fails.append((n, f"values differ ({len(da)} vs {len(db)} rows)"))
for n, why in fails:
    print(f"DIFF {n}: {why}")
print(f"{len(names) - len(fails)} identical, {len(fails)} differ")
sys.exit(1 if fails else 0)
