#!/bin/bash
# Full dual-scale correctness cycle: Verify + DuckDB oracle diff at
# sf0.01 and sf0.1. Exit 0 only if both scales are fully green.
set -u
cd "$(dirname "$0")/.."
for sf in 0.01 0.1; do
  out="/tmp/verify_dual_$sf"
  echo "[dual] $(date +%T) verify sf$sf"
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" \
    > "/tmp/dual_verify_$sf.log" 2>&1 || { echo "[dual] verify sf$sf FAILED"; exit 1; }
  echo "[dual] $(date +%T) oracle sf$sf"
  python3 tools/oracle_check.py "/root/testdata/sf$sf" "$out" \
    > "/tmp/dual_oracle_$sf.log" 2>&1
  tail -1 "/tmp/dual_oracle_$sf.log"
  grep -q ", 0 fail" "/tmp/dual_oracle_$sf.log" || { echo "[dual] sf$sf RED"; exit 1; }
done
echo "[dual] ALL GREEN"
