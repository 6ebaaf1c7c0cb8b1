#!/usr/bin/env bash
# One-command round bring-up: resume the long t1_dh_stand training run from
# the newest git-committed slim checkpoint (checkpoints/<task>/...), or start
# fresh if none exists.  Logs to logs/train_cont.console.
#
#   tools/resume_round.sh [num_envs] [iters]
set -euo pipefail
cd "$(dirname "$0")/.."
task=t1_dh_stand
num_envs="${1:-4096}"
iters="${2:-400000}"

# newest by mtime (name sort misorders across month boundaries)
slim=$(ls -td checkpoints/"$task"/*/model_* 2>/dev/null | head -1 || true)
stamp=$(date +%b%d_%H-%M-%S)
logdir="logs/$task/${stamp}_cont"
if [[ -n "$slim" ]]; then
  echo "resuming from $slim -> $logdir"
  nohup python tools/resume_migrate.py --ckpt "$slim" --num_envs "$num_envs" \
      --iters "$iters" --log_dir "$logdir" --log_every 100 \
      > logs/train_cont.console 2>&1 &
else
  echo "no committed checkpoint; fresh run"
  nohup python -m ti5_isaacgym_tpu.scripts.train --task "$task" \
      --num_envs "$num_envs" --max_iterations "$iters" \
      --run_name cont --log_every 100 > logs/train_cont.console 2>&1 &
fi
echo "pid: $!" | tee logs/train_cont.pid
