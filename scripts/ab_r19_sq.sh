#!/bin/bash
# Round-19 adjudication of the r18 sq_ivf_1m flat-family slide
# (twin 270.5 -> 200.0 q/s batch, 313.9 -> 217.4 sustained vs 85-95%
# anchors). Same-day back-to-back 1M-section runs, shared warm
# bench_cache, r17 code (f0ebf33, worktree .ab_r17) vs current tree.
# Knobs: shrink the 10k section (N=20000), skip 1mLR/2M/4M.
set -e
run_side() {
  local dir="$1" tag="$2"
  cd "$dir"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_N=20000 \
  SPARK_GRAFT_BENCH_N1MLR=0 SPARK_GRAFT_BENCH_N2M=0 SPARK_GRAFT_BENCH_N4M=0 \
  sbt -batch "runMain graft.Bench" > "/tmp/bench_ab_r19_$tag.log" 2>&1 || true
  grep -a '"metric"' "/tmp/bench_ab_r19_$tag.log" > "/tmp/bench_ab_r19_$tag.json" || true
}
run_side /root/repo/.ab_r17 r17
run_side /root/repo       r18
echo AB_DONE
