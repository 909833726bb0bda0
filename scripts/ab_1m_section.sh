#!/bin/bash
# Same-day 1M-section A/B between two code trees (r15 adjudication rule:
# cross-round absolute comparisons carry ~±25% day variance; only same-day
# back-to-back section runs on the same warm bench_cache are trustworthy).
# Usage: ab_1m_section.sh <tree-dir> <log-tag>
# Runs ONLY the 1M section (N1MLR=0 N2M=0 N4M=0) at full n1m with default
# nq; writes the JSON line to /tmp/bench_1m_<log-tag>.log
set -e
cd "$1"
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_N=20000 \
SPARK_GRAFT_BENCH_N1MLR=0 SPARK_GRAFT_BENCH_N2M=0 SPARK_GRAFT_BENCH_N4M=0 \
sbt -batch "runMain graft.Bench" 2>&1 | grep -a '"metric"' > "/tmp/bench_1m_$2.log"
