#!/usr/bin/env python3
"""Ablate the physics substep: full terrain vs tiny-table vs no-gather."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ti5_isaacgym_tpu.utils.jax_setup import setup_jax

setup_jax()

from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg
from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv
from ti5_isaacgym_tpu.physics.engine_core import substep_batched
from ti5_isaacgym_tpu.physics.contact import HeightField


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


N = 4096
cfg = T1EnvCfg()
cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=N))
env = T1DHStandEnv(cfg)
state = env.init_state(jax.random.PRNGKey(0))
print(f"heightfield shape: {env.heightfield.height.shape}, ncp={env.cp_meff.shape[0]}")
tau = jnp.zeros((N, env.num_actions), jnp.float32)

rough = env.heightfield.replace(height=state.terrain_height)
tiny = HeightField(height=jnp.zeros((8, 8), jnp.float32), hscale=1e6, offset=1e5)
variants = [
    ("rough (full table)", rough, ""),
    ("tiny table 8x8", tiny, ""),
    ("flat analytic (no gather)", tiny, "flat_analytic"),
    ("no contact force", tiny, "no_contact_force"),
    ("no contact (FK+ABA only)", tiny, "no_contact"),
]

for name, hf, ab in variants:
    @jax.jit
    def phys(ph, params, tau, hf=hf, ab=ab):
        def sub(p, _):
            p, cf = substep_batched(env.model, params.dynamics, hf, env.copts,
                                    env.sopts, p, tau, params.friction,
                                    env.cp_meff, _ablate=ab)
            return p, None
        ph, _ = jax.lax.scan(sub, ph, None, length=10)
        return ph
    t = timeit(phys, state.phys, state.params, tau)
    print(f"{name:28s}: {t*1e3:8.2f} ms / 10 substeps", flush=True)
