#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/PlanBudgets.scala from two
gate-style pinned Bench sweeps (dev tool; the re-baselining step the
PlanBudgets header mandates for intended plan changes).

Usage: python3 tools/budgets.py <bench_sf0.1.json> <bench_sf0.01.json>

Budget rules (unchanged since r12):
  byte maps (shuffle/input MB): max(0.5, round(measured * 1.3, 3))
  stage maps: the measured count (Bench alarms at > budget + 1)
"""
import json, sys

# Stage-count slack for queries whose counting is inherently racy:
# q_corpus_clean (two actions since r16 — the eager drop-list phase
# over an internal cache, then the declared single-aggregate frame)
# still races cache-materialization / broadcast-build jobs landing as
# their own tracked stages (the r15 five-action form showed a 144-146
# band across ten sweeps while its BYTE pins held within 0.3%).
# Every other query counts deterministically (slack 0). The slack
# widens only the alarm line (> budget+1), not the byte pins, which
# remain the sharp regression signal here.
STAGE_SLACK = {"q_corpus_clean": 3}

def load(path):
    lines = [json.loads(l) for l in open(path)]
    d = max(lines, key=lambda x: len(json.dumps(x)))
    for k in ("shuffle_mb", "input_mb", "stages"):
        if k not in d:
            sys.exit(f"{path}: missing {k} map (not a full-sweep line?)")
    return d

d01, d001 = load(sys.argv[1]), load(sys.argv[2])
if set(d01["stages"]) != set(d001["stages"]):
    sys.exit("keyset mismatch between the two sweeps")

def byte_budget(m):
    return max(0.5, round(m * 1.3, 3))

def fmt_double(v):
    s = f"{v:.3f}".rstrip("0")
    return s + "0" if s.endswith(".") else s

def scala_map(name, typ, entries, doc):
    rows = "\n".join(f'    "{k}" -> {v},' for k, v in sorted(entries.items()))
    return f"  /** {doc} */\n  val {name}: Map[String, {typ}] = Map(\n{rows}\n  )\n"

sections = []
for d, suf, sfdoc in ((d01, "AtSf01", "sf0.1"), (d001, "AtSf001", "sf0.01")):
    sections.append(scala_map(
        f"shuffleMb{suf}", "Double",
        {k: fmt_double(byte_budget(v)) for k, v in d["shuffle_mb"].items()},
        f"Per-query shuffle-write MB budgets at {sfdoc} (1.3x measured, 0.5 MB floor)."))
    sections.append(scala_map(
        f"inputMb{suf}", "Double",
        {k: fmt_double(byte_budget(v)) for k, v in d["input_mb"].items()},
        f"Per-query input-read MB budgets at {sfdoc} (1.3x measured, 0.5 MB floor)."))
    if any(v < 1 for v in d["stages"].values()):
        sys.exit(f"stage count < 1 (failed counting run?) in {suf} sweep")
    sections.append(scala_map(
        f"stages{suf}", "Int",
        {k: v + STAGE_SLACK.get(k, 0) for k, v in d["stages"].items()},
        f"Per-query planned-stage counts at {sfdoc} (measured; Bench alarms at > n+1)."))

HEADER = '''package graft

/** Per-query PLAN-COST budgets — the contention-immune regression
  * pins Bench checks on every driver run, in three dimensions:
  * shuffle-write MB, input-read MB and planned-stage count, each at
  * TWO pinned configurations (sf0.1 and sf0.01, full sweep, 32 CPUs,
  * AQE on). All three are functions of plan + data alone, so unlike
  * the time pins these need no floor normalization: a breach means
  * the PLAN regressed — an exchange appeared, partial aggregation
  * stopped combining, a broadcast fell back to shuffle, column
  * pruning lost a column — never that the host was busy.
  *
  * Budgets are 1.3x a pinned-config full-sweep reading with a 0.5 MB
  * absolute floor (bytes) / measured + 1 (stages — a small new
  * exchange can hide under the byte floor but not from the stage
  * count). The 1.3x headroom clears AQE partition-count jitter while
  * catching the >=2x jumps every real plan regression to date
  * produced.
  *
  * r15 RE-BASELINE: Bench's timed and byte-counting action moved from
  * `df.count()` to `df.queryExecution.toRdd.count()` (the declared
  * plan — count() provably pruned whole Window nodes, final sorts and
  * projection-only work; see Bench.benchAction + BenchActionSpec), so
  * every budget now covers the plan the hash verifies. Bytes and
  * stages rose for the formerly-pruned class by construction.
  *
  * Re-baseline deliberately, in the same commit as an intended plan
  * change: `python3 tools/budgets.py <sf0.1.json> <sf0.01.json>`
  * over the two gate-style sweeps (gate.sh step 5 writes them).
  */
object PlanBudgets {
'''

with open("src/main/scala/graft/PlanBudgets.scala", "w") as f:
    f.write(HEADER)
    f.write("\n".join(sections))
    f.write("}\n")
print(f"wrote PlanBudgets.scala: {len(d01['stages'])} keys x 6 maps")
