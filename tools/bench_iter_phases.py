#!/usr/bin/env python3
"""Decompose the REAL training iteration at a given env count.

Times three jitted programs built from the runner's own pieces:
  rollout-only   (24-step scan: act + env.step + storage)
  rollout + GAE
  full iteration (rollout + GAE + PPO update)
so the update cost is measured inside the actual compiled program rather
than inferred from standalone microbenches (which showed inconsistent
residuals, BASELINE.md round-4 notes).

Usage: python tools/bench_iter_phases.py [N ...]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from ti5_isaacgym_tpu.utils.jax_setup import setup_jax

setup_jax()


def timeit(fn, *args, iters=8, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ns = [int(a) for a in sys.argv[1:]] or [8192]
    from ti5_isaacgym_tpu.algo.ppo import PPO
    from ti5_isaacgym_tpu.algo.rollout import Transition, compute_gae
    from ti5_isaacgym_tpu.algo.runner import OnPolicyRunner
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

    print(f"devices: {jax.devices()}")
    for n in ns:
        cfg = T1EnvCfg()
        cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=n))
        env = T1DHStandEnv(cfg)
        runner = OnPolicyRunner(env, cfg, T1TrainCfg(), log_dir=None)
        carry = runner.init_carry()
        alg: PPO = runner.alg
        pcfg = runner.ppo_cfg
        T = runner.num_steps_per_env

        def rollout(carry):
            params = carry.ts.params

            def step(c, _):
                env_state, obs, priv, rng, cur_rew, cur_len = c
                rng, k_act = jax.random.split(rng)
                action, logp, mu, sigma, value = alg.act(params, obs, priv, k_act)
                env_state, obs2, priv2, rew, done, extras = env.step(env_state, action)
                rew_boot = rew + pcfg.gamma * value * extras["time_outs"].astype(jnp.float32)
                trans = Transition(obs=obs, critic_obs=priv, actions=action,
                                   rewards=rew_boot, dones=done, values=value,
                                   log_probs=logp, mu=mu, sigma=sigma)
                return (env_state, obs2, priv2, rng, cur_rew, cur_len), trans

            c0 = (carry.env_state, carry.obs, carry.priv_obs, carry.rng,
                  carry.cur_reward_sum, carry.cur_ep_len)
            c1, traj = jax.lax.scan(step, c0, None, length=T)
            return c1, traj

        def rollout_gae(carry):
            c1, traj = rollout(carry)
            last_values = alg.value(carry.ts.params, c1[2])
            returns, advantages = compute_gae(traj, last_values, pcfg.gamma, pcfg.lam)
            return c1, returns, advantages

        def full(carry):
            c1, traj = rollout(carry)
            last_values = alg.value(carry.ts.params, c1[2])
            returns, advantages = compute_gae(traj, last_values, pcfg.gamma, pcfg.lam)
            rng, k_up = jax.random.split(c1[3])
            ts, metrics = alg.update(carry.ts, traj, returns, advantages, k_up)
            return c1, ts, metrics

        t_r = timeit(jax.jit(rollout), carry)
        t_rg = timeit(jax.jit(rollout_gae), carry)
        t_f = timeit(jax.jit(full), carry)
        t_iter = timeit(runner._iter_fn, carry)
        print(f"N={n}:")
        print(f"  rollout only (24 steps)  : {t_r*1e3:8.2f} ms  "
              f"({T*n/t_r/1e3:.0f}k env-steps/s)")
        print(f"  + GAE                    : {t_rg*1e3:8.2f} ms  (gae {1e3*(t_rg-t_r):+.2f})")
        print(f"  + update (full)          : {t_f*1e3:8.2f} ms  (update {1e3*(t_f-t_rg):+.2f})")
        print(f"  runner._iter_fn          : {t_iter*1e3:8.2f} ms  "
              f"({T*n/t_iter/1e3:.0f}k env-steps/s)")


if __name__ == "__main__":
    main()
