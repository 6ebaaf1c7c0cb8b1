#!/usr/bin/env python3
"""Decompose training-step wall time on the real TPU.

Times, at each env count:
  * physics-only: the 10-substep decimation scan (engine_core.substep_batched)
  * env.step: physics + obs/reward/reset pipeline
  * train iteration: 24-step rollout + DH-PPO update (runner._iter_fn)

Usage: python tools/profile_step.py [N ...]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from ti5_isaacgym_tpu.utils.jax_setup import setup_jax

setup_jax()


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1024, 4096]
    from ti5_isaacgym_tpu.algo.runner import OnPolicyRunner
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv
    from ti5_isaacgym_tpu.physics.engine_core import substep_batched

    print(f"devices: {jax.devices()}")
    for n in ns:
        cfg = T1EnvCfg()
        cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=n))
        env = T1DHStandEnv(cfg)
        key = jax.random.PRNGKey(0)
        # jit the bring-up: eager execution round-trips the remote compiler
        # for every op on the axon backend
        state, obs, priv = jax.jit(lambda k: env.reset(env.init_state(k)))(key)
        jax.block_until_ready(obs)

        # --- physics-only: scan of 10 substeps with fixed torques ---
        hf = env.heightfield.replace(height=state.terrain_height)
        tau = jnp.zeros((n, env.num_actions), jnp.float32)

        @jax.jit
        def phys_only(phys, params, tau):
            def sub(ph, _):
                ph, cf = substep_batched(env.model, params.dynamics, hf,
                                         env.copts, env.sopts, ph, tau,
                                         params.friction, env.cp_meff)
                return ph, None
            phys, _ = jax.lax.scan(sub, phys, None, length=10)
            return phys

        t_phys = timeit(phys_only, state.phys, state.params, tau)

        # --- full env.step ---
        act = jnp.zeros((n, env.num_actions), jnp.float32)
        step = jax.jit(env.step)
        t_step = timeit(step, state, act)

        # --- full train iteration ---
        runner = OnPolicyRunner(env, cfg, T1TrainCfg(), log_dir=None)
        carry = runner.init_carry()
        it = runner._iter_fn

        def one_iter(c):
            c, m = it(c)
            return c

        t_iter = timeit(one_iter, carry, iters=3, warmup=1)
        nsteps = runner.num_steps_per_env

        print(f"N={n}:")
        print(f"  physics 10-substep scan : {t_phys*1e3:8.2f} ms "
              f"({n*10/t_phys/1e6:.3f}M env-substeps/s)")
        print(f"  env.step (phys+obs+rew) : {t_step*1e3:8.2f} ms "
              f"({n/t_step/1e3:.1f}k env-steps/s)")
        print(f"  non-physics part        : {(t_step-t_phys)*1e3:8.2f} ms")
        print(f"  train iter ({nsteps} steps)   : {t_iter*1e3:8.2f} ms "
              f"({n*nsteps/t_iter/1e3:.1f}k env-steps/s)")
        print(f"  learn overhead vs {nsteps}x step: "
              f"{(t_iter - nsteps*t_step)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
