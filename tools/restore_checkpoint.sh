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
# Committed checkpoints are SLIM (params/opt/curriculum only — see
# tools/sync_checkpoint.sh): `train --resume` restores with the full-carry
# template and would crash on the missing env_state subtree.  Detect slim
# checkpoints (no ('env_state', 'dof_pos') leaf in the orbax metadata) and
# refuse, pointing at the graft path.
for meta in checkpoints/"$task"/*/model_*/_METADATA; do
  [[ -f "$meta" ]] || continue
  if ! grep -q "('env_state', 'dof_pos'" "$meta"; then
    echo "ERROR: $(dirname "$meta") is a SLIM checkpoint; 'train --resume'" >&2
    echo "cannot load it.  Use tools/resume_round.sh (grafts it through" >&2
    echo "tools/resume_migrate.py) instead." >&2
    exit 1
  fi
done
mkdir -p "logs/$task"
cp -rn "checkpoints/$task"/. "logs/$task"/
echo "restored:"
ls -td logs/"$task"/*/model_* | head -3
