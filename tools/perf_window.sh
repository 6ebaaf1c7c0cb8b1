#!/usr/bin/env bash
# Single-client TPU perf window: run bench.py under different runtime
# configurations, sequentially (the axon tunnel admits ONE process), and
# append results to PERF_EXPERIMENTS.jsonl.
#
# PRECONDITION: no other process (training!) is holding the TPU.
#
#   tools/perf_window.sh [num_envs]
set -uo pipefail
cd "$(dirname "$0")/.."
n="${1:-8192}"
out=PERF_EXPERIMENTS.jsonl

run() {
  local name="$1"; shift
  echo "=== $name ($*) ===" >&2
  local t0=$(date +%s)
  local line
  line=$(env "$@" BENCH_NUM_ENVS="$n" timeout 2400 python bench.py 2>/dev/null | tail -1)
  local rc=$?
  local dt=$(( $(date +%s) - t0 ))
  echo "{\"experiment\": \"$name\", \"num_envs\": $n, \"wall_s\": $dt, \"rc\": $rc, \"bench\": $line}" | tee -a "$out"
}

run baseline TI5_NOOP=1
run donate_carry TI5_DONATE_CARRY=1
run rbg_prng TI5_PRNG=rbg
run rbg_donate TI5_PRNG=rbg TI5_DONATE_CARRY=1
