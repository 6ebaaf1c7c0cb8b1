#!/usr/bin/env bash
# End-of-round evaluation: run the full deployment gate on the newest
# checkpoint and commit the artifacts.  CPU-pinned so it cannot claim the
# TPU tunnel (safe to run while training holds the chip, though quieter
# without).
#
#   tools/final_eval.sh [run_dir] [steps]
set -euo pipefail
cd "$(dirname "$0")/.."
run="${1:-$(ls -td logs/t1_dh_stand/*/ | head -1)}"
steps="${2:-600}"

export TI5_PLATFORM=cpu JAX_PLATFORMS=cpu
echo "evaluating $run (${steps} steps)"
# capture rc without tripping `set -e` so the diagnostics below still run
rc=0
python tools/eval_report.py --run "$run" --out eval_round4 --steps "$steps" || rc=$?
echo "eval_report rc=$rc"
ls -la eval_round4/
exit $rc
