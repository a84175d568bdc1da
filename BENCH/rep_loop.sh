#!/bin/bash
# Alternating scaling reps for the noisy-host methodology: every bench
# run appends one JSON line to /tmp/scaling_reps.jsonl; aggregate with
# BENCH/aggregate_reps.py (per-level minima).
cd /root/repo
for i in $(seq 1 ${REPS:-12}); do
  for CPUS in 8 2; do
    SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    BENCH_FILES=${FILES:-300000} BENCH_SHUFFLE=64 BENCH_SHARDS=32 \
    timeout 1500 python bench.py 2>/dev/null | grep '^{' >> /tmp/scaling_reps.jsonl
  done
done
echo DONE >> /tmp/scaling_reps.jsonl
