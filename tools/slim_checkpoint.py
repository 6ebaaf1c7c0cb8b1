#!/usr/bin/env python3
"""Slim a full training checkpoint for git persistence.

Full checkpoints embed the whole env state (~100 MB at 4096 envs: obs
histories, lag rings, physics state).  For cross-round persistence only the
learning state matters: network params, optimizer state, LR, iteration, RNG,
and the small curriculum fields (terrain levels/origins, command range, the
common step counter that drives the push/ext-force escalation schedules).
Everything else re-initializes on resume via tools/resume_migrate.py's graft
(missing fields keep fresh values), at the cost of restarting the current
episodes.

  python tools/slim_checkpoint.py <full_ckpt_dir> <out_dir>
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEEP_ENV_FIELDS = ("terrain_level", "terrain_type", "env_origin",
                   "cmd_vx_range", "common_step")


def main():
    src, dst = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    # restore as host numpy: the source may have been written under a
    # different device topology (e.g. the 8-virtual-device test mesh), whose
    # sharding cannot be reconstructed here
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(src).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    raw = ckptr.restore(src, restore_args=restore_args)
    env_state = raw.get("env_state") or {}
    slim = {
        "params": raw["params"],
        "opt_state": raw["opt_state"],
        "lr": raw["lr"],
        "iteration": raw["iteration"],
        "rng": raw["rng"],
        "env_state": {k: env_state[k] for k in KEEP_ENV_FIELDS
                      if k in env_state},
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(dst, slim, force=True)
    # orbax async: wait before the caller tars/commits the directory
    if hasattr(ckptr, "wait_until_finished"):
        ckptr.wait_until_finished()
    print(f"slimmed {src} -> {dst}")


if __name__ == "__main__":
    main()
