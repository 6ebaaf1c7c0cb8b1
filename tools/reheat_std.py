#!/usr/bin/env python3
"""Reheat the policy's exploration std in a training checkpoint.

Round-3 diagnosis: by ~30k iterations the per-action std had annealed to
0.06-0.16 (init 1.0) while the policy was still in the two-foot-shuffle
local optimum, so stepping could no longer be discovered (escape
probability ~0 at 0.1 std).  An overlay experiment showed the trained
stander BALANCES THROUGH scripted stepping (8 s, no fall), i.e. walking is
reachable from the current policy's neighborhood — it just needs
exploration back.  This tool rewrites the ``params/std`` leaf of a full
runner checkpoint to ``--std`` (default 0.4) and zeroes the Adam moments of
that leaf so the optimizer does not immediately pull it back down.

  python tools/reheat_std.py <ckpt_dir> <out_dir> [--std 0.4]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--std", type=float, default=0.4)
    args = ap.parse_args()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    src = os.path.abspath(args.src)
    meta = ckptr.metadata(src).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    raw = ckptr.restore(src, restore_args=restore_args)

    std = raw["params"]["params"]["std"]
    print("old std:", np.asarray(std))
    raw["params"]["params"]["std"] = np.full_like(std, args.std)
    print("new std:", raw["params"]["params"]["std"])

    # zero the Adam moments for the std leaf wherever they appear in the
    # optax state (mu/nu trees mirror the params tree)
    def zero_std(tree, path="opt"):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "std" and isinstance(v, np.ndarray):
                    tree[k] = np.zeros_like(v)
                    print(f"zeroed {path}/{k}")
                else:
                    zero_std(v, f"{path}/{k}")
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                zero_std(v, f"{path}/{i}")

    zero_std(raw.get("opt_state", {}))
    out = ocp.PyTreeCheckpointer()
    out.save(os.path.abspath(args.dst), raw, force=True)
    if hasattr(out, "wait_until_finished"):
        out.wait_until_finished()
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
