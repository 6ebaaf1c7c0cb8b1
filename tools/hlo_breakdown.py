#!/usr/bin/env python3
"""Compile-only breakdown of the policy step / post-physics on the TPU
backend: lower + compile (no execution, safe while a training run owns the
chip) and report fusion counts and aggregate cost analysis.  Launch-bound
phases show up as high kernel counts with tiny per-kernel work.

Usage: python tools/hlo_breakdown.py [N] [what]
  what: step | post | iter   (default: post)
"""
from __future__ import annotations

import collections
import dataclasses
import re
import sys

import jax
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp

from ti5_isaacgym_tpu.utils.jax_setup import setup_jax

setup_jax()


def report(compiled, name):
    txt = compiled.as_text()
    # count top-level instructions in the entry computation by opcode
    ops = collections.Counter()
    entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            entry = True
            continue
        if entry:
            if line.startswith("}"):
                break
            m = re.match(r"\s+\S+ = \S+ (\w+)[.(]", line)
            if m:
                ops[m.group(1)] += 1
    # fusion kinds across the whole module
    kinds = collections.Counter(re.findall(r'kind=(\w+)', txt))
    n_fusion = txt.count(" fusion(")
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"== {name} ==")
    print(f"  module instructions: {len(txt.splitlines())} lines, "
          f"{n_fusion} fusion ops")
    print(f"  fusion kinds: {dict(kinds)}")
    print(f"  entry opcodes: {dict(ops.most_common(20))}")
    if ca:
        flops = ca.get("flops", 0.0)
        bytes_ = ca.get("bytes accessed", 0.0)
        print(f"  flops={flops:.3e}  bytes={bytes_:.3e}  "
          f"(v5e roofline: {flops/394e12*1e6:.1f} us MXU, "
          f"{bytes_/819e9*1e6:.1f} us HBM)")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    what = sys.argv[2] if len(sys.argv) > 2 else "post"
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

    cfg = T1EnvCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=n))
    env = T1DHStandEnv(cfg)
    key = jax.random.PRNGKey(0)
    state = jax.eval_shape(env.init_state, key)
    act = jax.ShapeDtypeStruct((n, env.num_actions), jnp.float32)
    k = jax.ShapeDtypeStruct((2,), jnp.uint32)

    if what == "step":
        c = jax.jit(env.step).lower(state, act).compile()
        report(c, f"env.step N={n}")
    elif what == "post":
        c = jax.jit(env._post_physics_step).lower(state, k).compile()
        report(c, f"post_physics N={n}")
        c = jax.jit(lambda s, kk: env._compute_observations(s, kk)).lower(state, k).compile()
        report(c, f"compute_observations N={n}")
        c = jax.jit(lambda s, d, kk: env._reset_idx(s, d, kk)).lower(
            state, jax.ShapeDtypeStruct((n,), bool), k).compile()
        report(c, f"reset_idx N={n}")
        c = jax.jit(lambda s, c_: env._compute_rewards(s, c_)[1]).lower(
            state, jax.eval_shape(env._make_ctx, state)).compile()
        report(c, f"compute_rewards N={n}")
        c = jax.jit(env._make_ctx).lower(state).compile()
        report(c, f"make_ctx (fallback FK) N={n}")
    elif what == "iter":
        from ti5_isaacgym_tpu.algo.runner import OnPolicyRunner
        runner = OnPolicyRunner(env, cfg, T1TrainCfg(), log_dir=None)
        carry = jax.eval_shape(runner.init_carry)
        c = jax.jit(runner._make_iteration()).lower(carry).compile()
        report(c, f"train iteration N={n}")


if __name__ == "__main__":
    main()
