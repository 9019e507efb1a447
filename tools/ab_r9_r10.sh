#!/bin/bash
# Same-window A/B for the r9->r10 common-gate drift attribution
# (VERDICT r10, next-round item 1). Four full Bench passes back to
# back in one window, ABA-bracketed so contention drift is visible:
#   1. r9 closing code (106ea2b)
#   2. r10 closing code (c118e4e), TrackedPersist drain ON  (honest cold)
#   3. r10 closing code, GRAFT_NO_DRAIN=1                    (r9-style leaky cold)
#   4. r9 closing code again (contention bracket)
# Artifacts land in bench_history/ as r11_ab_*.json.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
mkdir -p bench_history
run() { # run <worktree> <outname> [env=val]
  local wt="$1" out="$2"; shift 2
  echo "[ab] $(date +%T) start $out"
  (cd ".ab/$wt" && env "$@" sbt -batch "runMain graft.Bench" \
     > "/tmp/ab_${out}.log" 2>&1)
  local rc=$?
  cp ".ab/$wt/BENCH_LAST.json" "bench_history/r11_ab_${out}.json" 2>/dev/null
  echo "[ab] $(date +%T) done $out rc=$rc"
}
run r9  r9_pass1 X=1
run r10 r10_drain X=1
run r10 r10_nodrain GRAFT_NO_DRAIN=1
run r9  r9_pass2 X=1
echo "[ab] ALL DONE"
