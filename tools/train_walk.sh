#!/usr/bin/env bash
# One-command reproduction of the walking recipe (VERDICT r4 item 8) — the
# round-3 phase schedule, no archaeology required:
#
#   phase A (gait bootstrap, ~18k iters): FRESH policy trained with the
#     reference's own ref-action overlay (cfg.env.use_ref_actions, reference
#     t1_dh_stand_config.py:24) ON plus boosted stepping shaping
#     (feet_air_time 8x, feet_clearance 4x, feet_contact_number 2x) so
#     stepping is the policy's default experience from iteration 0;
#   phase B (internalization): newest phase-A checkpoint, exploration std
#     reheated to 0.4 (tools/reheat_std.py), overlay OFF, the reference's
#     shipped reward scales — the policy keeps the gait it already has
#     (phase is observable) and optimizes it under the true objective.
#
# Knobs (env vars): TASK NUM_ENVS P1_ITERS P2_ITERS STD SMOKE
#   SMOKE=1 -> CPU backend, 16 envs, 3 iters/phase: verifies the mechanics
#   (fresh train -> checkpoint -> reheat -> resume) end to end in minutes.
#
#   tools/train_walk.sh                 # full recipe on the TPU
#   SMOKE=1 tools/train_walk.sh         # CPU mechanics check
set -euo pipefail
cd "$(dirname "$0")/.."

TASK=${TASK:-t1_dh_stand}
NUM_ENVS=${NUM_ENVS:-4096}
P1_ITERS=${P1_ITERS:-18000}
P2_ITERS=${P2_ITERS:-80000}
STD=${STD:-0.4}
LOG_EVERY=${LOG_EVERY:-100}
if [[ "${SMOKE:-0}" == "1" ]]; then
  export TI5_PLATFORM=cpu JAX_PLATFORMS=cpu
  NUM_ENVS=16 P1_ITERS=3 P2_ITERS=3 LOG_EVERY=1
fi

echo "== phase A: gait bootstrap (overlay + shaping, $P1_ITERS iters) =="
python -m ti5_isaacgym_tpu.scripts.train --task "$TASK" \
  --num_envs "$NUM_ENVS" --max_iterations "$P1_ITERS" \
  --run_name walkA --log_every "$LOG_EVERY" \
  --use_ref_actions 1 \
  --reward_scales 'feet_air_time=8.0,feet_clearance=4.0,feet_contact_number=2.4'

ckpt=$(ls -td logs/"$TASK"/*_walkA/model_* | head -1)
echo "== phase A checkpoint: $ckpt =="

reheated="${ckpt%/*}/reheated_$(basename "$ckpt")"
python tools/reheat_std.py "$ckpt" "$reheated" --std "$STD"
echo "== std reheated to $STD: $reheated =="

echo "== phase B: internalization (reference scales, overlay off, $P2_ITERS iters) =="
stamp=$(date +%b%d_%H-%M-%S)
python tools/resume_migrate.py --ckpt "$reheated" --num_envs "$NUM_ENVS" \
  --iters "$P2_ITERS" --log_dir "logs/$TASK/${stamp}_walkB" \
  --log_every "$LOG_EVERY"
echo "== done: logs/$TASK/${stamp}_walkB =="
