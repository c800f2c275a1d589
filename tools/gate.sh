#!/bin/bash
# Full round gate for the graft engine, in one command (dev tool; the
# canonical sequence from .claude/skills/verify/SKILL.md). Runs:
#   1. the full scalatest suite (incl. plan-shape gates)
#   2. Verify + DuckDB burnin at sf0.001, sf0.01 AND sf0.1 (sf0.1 has
#      caught divergences the smaller scales missed)
#   3. the partitioning-invariance probe (different CPU counts)
#   4. the PlanAudit 4-sweep regression gate
#   5. the flagship Smoke
# Exits nonzero on the first failure. ~15-20 min end to end.
# GATE DISCIPLINE: run this LAST — no src/main edits after it passes.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/5] sbt test =="
sbt -batch test

echo "== [2/5] Verify + burnin at three scale factors =="
for sf in sf0.001 sf0.01 sf0.1; do
  out="/tmp/gate_${sf}"
  sbt -batch "runMain graft.Verify /root/testdata/${sf} ${out}"
  python3 tools/burnin.py "/root/testdata/${sf}" "${out}"
done

echo "== [3/5] partitioning invariance (7 vs default CPUs) =="
SPARK_GRAFT_CPUS=7 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/gate_pA"
python3 tools/partcheck.py /tmp/gate_pA /tmp/gate_sf0.001

echo "== [4/5] PlanAudit =="
sbt -batch "Test/runMain graft.queries.PlanAudit"

echo "== [5/5] Smoke =="
# Capture first, grep after: piping sbt straight into `grep -q` under
# pipefail lets grep exit on first match, sbt then dies of SIGPIPE
# (141) and a SUCCESSFUL Smoke run is misreported as a failure.
smoke_out=$(sbt -batch "runMain graft.Smoke")
echo "$smoke_out" | grep -q "entry rows" || {
  echo "smoke output missing entry rows"; exit 1; }

echo "== gate green =="
