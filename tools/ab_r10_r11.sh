#!/bin/bash
# Same-window A/B: r10 closing code (.ab/r10 worktree, drain on) vs the
# r11 head (this repo) — measures the round-11 clawbacks (merged dup
# probe, IVF-PQ index memo, substr-dup/packing exchange rework) under
# identical contention, ABA-bracketed.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
mkdir -p bench_history
echo "[ab2] $(date +%T) start r10_a"
(cd .ab/r10 && sbt -batch "runMain graft.Bench" > /tmp/ab2_r10a.log 2>&1)
cp .ab/r10/BENCH_LAST.json bench_history/r11_ab2_r10_a.json
echo "[ab2] $(date +%T) start r11_head"
(sbt -batch "runMain graft.Bench" > /tmp/ab2_head.log 2>&1)
cp BENCH_LAST.json bench_history/r11_ab2_head.json
echo "[ab2] $(date +%T) start r10_b"
(cd .ab/r10 && sbt -batch "runMain graft.Bench" > /tmp/ab2_r10b.log 2>&1)
cp .ab/r10/BENCH_LAST.json bench_history/r11_ab2_r10_b.json
echo "[ab2] $(date +%T) ALL DONE"
