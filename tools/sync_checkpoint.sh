#!/usr/bin/env bash
# Persist the newest training checkpoint into the git-committed checkpoints/
# tree so training survives driver rounds (logs/**/model_* is .gitignored and
# the machine is re-imaged between rounds; round 2 lost a 41k-iteration run
# this way).
#
#   tools/sync_checkpoint.sh [task]          # default t1_dh_stand
#
# Copies the newest logs/<task>/<run>/model_<it> into
# checkpoints/<task>/<run>/model_<it>, removes older synced checkpoints for
# that task (keep exactly one), and copies the run's metrics.csv/config.json.
set -euo pipefail
cd "$(dirname "$0")/.."
task="${1:-t1_dh_stand}"

# newest by mtime — a name sort would order runs by the alphabetic month
# token (Dec < Feb) and can pick an older run across month boundaries
newest=$(ls -td logs/"$task"/*/model_* 2>/dev/null | head -1 || true)
if [[ -z "$newest" ]]; then
  echo "no checkpoints under logs/$task" >&2
  exit 1
fi
run_dir=$(dirname "$newest")
run=$(basename "$run_dir")
dest="checkpoints/$task/$run/$(basename "$newest")"
if [[ -d "$dest" ]]; then
  echo "already synced: $dest"
else
  mkdir -p "$(dirname "$dest")"
  tmp="$dest.tmp.$$"
  # slim: params/opt/curriculum only (~10 MB vs ~100 MB full; see
  # tools/slim_checkpoint.py) — resume via tools/resume_migrate.py
  JAX_PLATFORMS=cpu python tools/slim_checkpoint.py "$newest" "$tmp"
  mv "$tmp" "$dest"
  # keep only the newest synced checkpoint per task
  for old in $(ls -d checkpoints/"$task"/*/model_* 2>/dev/null); do
    [[ "$old" == "$dest" ]] || rm -rf "$old"
  done
  # drop run dirs emptied by pruning
  find "checkpoints/$task" -mindepth 1 -maxdepth 1 -type d -empty -delete
  echo "synced $newest -> $dest"
fi
cp "$run_dir"/metrics.csv "checkpoints/$task/$run/" 2>/dev/null || true
cp "$run_dir"/config.json "checkpoints/$task/$run/" 2>/dev/null || true
