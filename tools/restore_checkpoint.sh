#!/usr/bin/env bash
# Restore git-committed checkpoints back under logs/ so `train --resume`
# (which scans logs/<task>/<run>/model_*) can pick them up at the start of a
# fresh round.  Inverse of tools/sync_checkpoint.sh.
#
#   tools/restore_checkpoint.sh [task]       # default t1_dh_stand
set -euo pipefail
cd "$(dirname "$0")/.."
task="${1:-t1_dh_stand}"
if [[ ! -d "checkpoints/$task" ]]; then
  echo "no committed checkpoints for $task" >&2
  exit 1
fi
mkdir -p "logs/$task"
cp -rn "checkpoints/$task"/. "logs/$task"/
echo "restored:"
ls -d logs/"$task"/*/model_* | sort -t_ -k2 -V | tail -3
