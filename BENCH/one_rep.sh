#!/bin/bash
# One bench run at $1 cores; appends its JSON line to /tmp/scaling_reps.jsonl
cd /root/repo
SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
BENCH_FILES=${FILES:-400000} BENCH_SHUFFLE=64 BENCH_SHARDS=32 \
python bench.py 2>/dev/null | grep '^{' >> /tmp/scaling_reps.jsonl
tail -1 /tmp/scaling_reps.jsonl
