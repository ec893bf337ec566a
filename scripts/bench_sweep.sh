#!/bin/bash
# Sequential on-chip bench sweep (one jax/TPU process at a time — CLAUDE.md).
# Usage: bash scripts/bench_sweep.sh <tag> <case:batch:prec:cap[:extra_env]>...
# Logs to /tmp/sw_<tag>_<i>.log
set -u
tag=${1:?tag}; shift
i=0
for spec in "$@"; do
  IFS=: read -r c b p cap extra <<<"$spec"
  log=/tmp/sw_${tag}_${i}_${c}b${b}_${p}_cap${cap}.log
  echo "=== case=$c batch=$b prec=$p cap=$cap $extra ===" > "$log"
  env SQP_BENCH_CASE=$c SQP_BENCH_BATCH=$b SQP_BENCH_PREC=$p \
      SQP_BENCH_SCHUR_CAP=$cap $extra \
      timeout 1800 python bench.py >> "$log" 2>&1
  echo "EXIT=$?" >> "$log"
  i=$((i+1))
done
echo ALL_DONE
