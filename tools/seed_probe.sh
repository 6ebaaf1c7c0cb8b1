#!/usr/bin/env bash
# Seed probe for reference-config walking (BASELINE.md round-4 amendment):
# under the shipped config the walking optimum is reached in only ~1 of 4
# fresh runs, but the outcome is readable by iteration ~1500 from the
# feet_air_time episode reward (walker ~9e-4 at it 500 rising to 3e-3 by 3k;
# shuffle ~2e-4 and falling).  This script launches fresh runs over a seed
# list, reads the signature at PROBE_ITERS, kills shuffles, and leaves the
# first walker training (sync it with tools/sync_checkpoint.sh).
#
#   tools/seed_probe.sh [seed ...]        # default: 21 22 23 24 25 26
# Env: NUM_ENVS (4096) PROBE_ITERS (1500) THRESH (5e-4)
#
# Refined protocol from the round-4 probe campaign (8 seeds): the walker
# (s1) separates by it 300 (airt 7.5e-4, clearance 0.02 vs shuffle 2e-4 /
# 0.004) and rises monotonically; one seed (17) matched the walker at 200
# then collapsed by 300 — so read the signature at PROBE_ITERS and only
# after a 500-iteration confirmation window (the default window below
# averages it 1000-1500, past any transient).
set -uo pipefail
cd "$(dirname "$0")/.."

seeds=("${@:-}")
[[ -z "${seeds[0]:-}" ]] && seeds=(21 22 23 24 25 26)
NUM_ENVS="${NUM_ENVS:-4096}"
PROBE_ITERS="${PROBE_ITERS:-1500}"
THRESH="${THRESH:-0.0005}"

for seed in "${seeds[@]}"; do
  stamp=$(date +%b%d_%H-%M-%S)
  run="probe_s${seed}"
  echo "== probing seed $seed =="
  nohup python -m ti5_isaacgym_tpu.scripts.train --task t1_dh_stand \
      --num_envs "$NUM_ENVS" --max_iterations 400000 --seed "$seed" \
      --run_name "$run" --log_every 100 > "logs/train_${run}.console" 2>&1 &
  pid=$!
  echo "pid $pid"
  # wait until the run reaches PROBE_ITERS (or dies)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    last=$(grep -oE "^it +[0-9]+" "logs/train_${run}.console" | tail -1 | awk '{print $2}')
    [[ -n "${last:-}" && "$last" -ge "$PROBE_ITERS" ]] && break
  done
  if ! kill -0 "$pid" 2>/dev/null; then
    echo "seed $seed: process died; see logs/train_${run}.console"
    continue
  fi
  csv=$(ls -td logs/t1_dh_stand/*_"$run"/metrics.csv 2>/dev/null | head -1)
  if [[ -z "$csv" || ! -f "$csv" ]]; then
    # no metrics file (log dir naming changed / run died past the grep loop):
    # don't leave an unreadable probe training forever (ADVICE r4)
    echo "seed $seed: no metrics.csv found — killing pid $pid and skipping"
    kill "$pid" 2>/dev/null
    sleep 5
    continue
  fi
  airt=$(python - "$csv" "$PROBE_ITERS" <<'EOF'
import csv, sys
rows = [r for r in csv.DictReader(open(sys.argv[1]))]
probe = int(sys.argv[2])
win = [float(r["rew_feet_air_time"]) for r in rows
       if probe - 500 <= int(r["iteration"]) <= probe]
print(sum(win) / max(len(win), 1))
EOF
)
  echo "seed $seed: feet_air_time(mean it $((PROBE_ITERS-500))-$PROBE_ITERS) = $airt"
  alive=$(python -c "print(int(float('$airt') > float('$THRESH')))")
  if [[ "$alive" == "1" ]]; then
    echo "seed $seed WALKS — leaving it training (pid $pid)"
    echo "pid: $pid" > "logs/train_${run}.pid"
    exit 0
  fi
  echo "seed $seed shuffles — killing"
  kill "$pid" 2>/dev/null
  sleep 5
done
echo "no walking seed found in: ${seeds[*]}"
exit 1
