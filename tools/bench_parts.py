#!/usr/bin/env python3
"""Decompose the policy step: cell gather, substep scan (1-D vs 2-D layout),
post-physics (obs/reward/reset/ctx).

Usage: python tools/bench_parts.py [N]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from ti5_isaacgym_tpu.utils.jax_setup import setup_jax

setup_jax()


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg
    from ti5_isaacgym_tpu.envs import legged
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv
    from ti5_isaacgym_tpu.physics.contact import (
        gather_cells_supercell, gather_contact_cells, packed_cell_corners)
    from ti5_isaacgym_tpu.physics.engine_core import (contact_point_xy,
                                                      substep_batched)

    print(f"devices: {jax.devices()}  N={n}")
    cfg = T1EnvCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=n))
    env = T1DHStandEnv(cfg)
    key = jax.random.PRNGKey(0)
    state, obs, priv = jax.jit(lambda k: env.reset(env.init_state(k)))(key)
    jax.block_until_ready(obs)
    hf = env.heightfield.replace(height=state.terrain_height)

    # --- cell gathers ---
    pxy = jax.jit(lambda s: contact_point_xy(env.model, s.phys))
    px0, py0 = pxy(state)
    t = timeit(pxy, state)
    print(f"contact_point_xy (FK)        : {t*1e3:8.3f} ms")

    packed = jax.jit(packed_cell_corners)(state.terrain_height)

    g_old = jax.jit(lambda px, py: gather_contact_cells(hf, packed, px, py))
    t = timeit(g_old, px0, py0)
    print(f"packed-corner gather [32xN]  : {t*1e3:8.3f} ms")

    g_new = jax.jit(lambda s, px, py: gather_cells_supercell(
        env.supertable, s.phys.base_pos[:, 0], s.phys.base_pos[:, 1], px, py))
    t = timeit(g_new, state, px0, py0)
    print(f"supercell gather+extract     : {t*1e3:8.3f} ms")

    # --- substep scan with frozen cells, 1-D vs 2-D layout ---
    cells = g_new(state, px0, py0)
    tau = jnp.zeros((n, env.num_actions), jnp.float32)

    def scan10(phys, params, friction, cells):
        def sub(ph, _):
            ph, cf = substep_batched(env.model, params, hf, env.copts,
                                     env.sopts, ph, tau.reshape(ph.qpos.shape),
                                     friction, env.cp_meff, cell_cache=cells)
            return ph, None
        phys, _ = jax.lax.scan(sub, phys, None, length=10)
        return phys

    f1 = jax.jit(lambda s, c: scan10(s.phys, s.params.dynamics, s.params.friction, c))
    t = timeit(f1, state, cells)
    print(f"10-substep scan, [N] 1-D     : {t*1e3:8.3f} ms")

    rows = 8
    def to2(x):
        return x.reshape((rows, n // rows) + x.shape[1:])
    f2 = jax.jit(lambda s, c: scan10(
        jax.tree.map(to2, s.phys),
        jax.tree.map(to2, s.params.dynamics),
        to2(s.params.friction),
        jax.tree.map(lambda x: x.reshape((x.shape[0], rows, n // rows)), c)))
    t = timeit(f2, state, cells)
    print(f"10-substep scan, [8,N/8] 2-D : {t*1e3:8.3f} ms")

    # --- full step + post-physics remainder ---
    step = jax.jit(env.step)
    act = jnp.zeros((n, env.num_actions), jnp.float32)
    t_step = timeit(step, state, act)
    print(f"env.step total               : {t_step*1e3:8.3f} ms "
          f"({n/t_step/1e3:.1f}k env-steps/s)")

    post = jax.jit(lambda s, k: env._post_physics_step(s, k))
    t = timeit(post, state, key)
    print(f"post_physics (ctx+rew+reset+obs): {t*1e3:8.3f} ms")

    ctx = jax.jit(lambda s: env._make_ctx(s))
    t = timeit(ctx, state)
    print(f"  _make_ctx (AoS FK)         : {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
