#!/usr/bin/env python3
"""Resume training from a checkpoint whose pytree structure predates new
EnvState/EnvParams fields (e.g. restitution, dof_pos/vel lag steps).

A strict orbax template restore fails when fields were added since the save;
this script raw-restores the saved tree, grafts every field that still
exists onto a freshly initialized carry (new fields keep their fresh
values), and continues training in-process.

  python tools/resume_migrate.py --ckpt logs/t1_dh_stand/<run>/model_29500 \
      --num_envs 4096 --iters 170000 --log_dir logs/t1_dh_stand/<new_run>
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def graft(fresh, saved):
    """Recursively overlay `saved` (a raw orbax dict tree) onto `fresh`
    (typed pytree); fields missing from `saved` keep their fresh values."""
    import jax.numpy as jnp

    if saved is None:
        return fresh
    if hasattr(fresh, "__dataclass_fields__"):
        updates = {}
        for f in dataclasses.fields(fresh):
            if isinstance(saved, dict) and f.name in saved:
                updates[f.name] = graft(getattr(fresh, f.name), saved[f.name])
        return fresh.replace(**updates) if hasattr(fresh, "replace") \
            else dataclasses.replace(fresh, **updates)
    if isinstance(saved, dict) and isinstance(fresh, dict):
        return {k: graft(fresh[k], saved[k]) if k in saved else fresh[k]
                for k in fresh}
    if hasattr(fresh, "_fields"):   # NamedTuple (e.g. optax states)
        if isinstance(saved, dict):
            items = [graft(getattr(fresh, n), saved.get(n, saved.get(str(i))))
                     for i, n in enumerate(fresh._fields)]
        else:
            sv = list(saved) if isinstance(saved, (list, tuple)) else []
            sv += [None] * (len(fresh) - len(sv))
            items = [graft(x, s) for x, s in zip(fresh, sv)]
        return type(fresh)(*items)
    if isinstance(fresh, (tuple, list)):
        if isinstance(saved, dict):     # {'0': ..., '1': ...} encoding
            items = [graft(x, saved.get(str(i))) for i, x in enumerate(fresh)]
        else:
            sv = list(saved) if isinstance(saved, (list, tuple)) else []
            sv += [None] * (len(fresh) - len(sv))
            items = [graft(x, s) for x, s in zip(fresh, sv)]
        return type(fresh)(items)
    if hasattr(fresh, "dtype"):
        arr = jnp.asarray(saved)
        return arr.astype(fresh.dtype) if arr.dtype != fresh.dtype else arr
    return saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=170000)
    ap.add_argument("--log_dir", default=None)
    ap.add_argument("--log_every", type=int, default=100)
    args = ap.parse_args()

    from ti5_isaacgym_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import orbax.checkpoint as ocp

    from ti5_isaacgym_tpu.algo.runner import OnPolicyRunner
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

    cfg = T1EnvCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env,
                                                           num_envs=args.num_envs))
    env = T1DHStandEnv(cfg)
    runner = OnPolicyRunner(env, cfg, T1TrainCfg(), log_dir=args.log_dir)
    carry = runner.init_carry()

    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt))
    ts = carry.ts.replace(
        params=graft(carry.ts.params, raw["params"]),
        opt_state=graft(carry.ts.opt_state, raw["opt_state"]),
        lr=graft(carry.ts.lr, raw["lr"]))
    env_state = graft(carry.env_state, raw["env_state"])
    carry = carry._replace(
        ts=ts, env_state=env_state, rng=graft(carry.rng, raw["rng"]),
        obs=env_state.obs_hist, priv_obs=env_state.critic_hist)
    runner.iteration_count = int(raw["iteration"])
    print(f"migrated resume from {args.ckpt} at iteration "
          f"{runner.iteration_count}", flush=True)
    runner.learn(args.iters, carry=carry, log_every=args.log_every)


if __name__ == "__main__":
    main()
