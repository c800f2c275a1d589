#!/bin/bash
# Mid-sweep contention burst generator — the validation load for
# Bench's interleaved floor probes (SCALE.md "Interleaved floor
# probes"): alternates 20 s of 24-thread spin with 20 s of quiet,
# after a 90 s grace covering warmup + the early sweep, until killed.
# This is the r17 driver-weather shape: bursts that arrive and leave
# BETWEEN the two end-of-sweep probes, which the pre-r18 floorline
# pricing could not see. Usage:
#   bash tools/burst.sh & BPID=$!
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
#   kill $BPID
# Expected: floorline_excess_sec within ~1.5x of an idle sweep's
# reading while the raw total inflates by several seconds.
sleep 90
while true; do
  for i in $(seq 1 24); do
    (end=$((SECONDS+20)); while [ $SECONDS -lt $end ]; do :; done) &
  done
  wait
  sleep 20
done
