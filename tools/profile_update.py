#!/usr/bin/env python3
"""Op-level profile of the PPO update (or full iteration) on the live backend.

Captures a jax.profiler trace of the jitted program and prints the top-k
XLA ops by self time, aggregated by op category — the microbench residual
(BASELINE.md round-4) was unattributable without this.

Usage: python tools/profile_update.py [N] [update|full|rollout]
"""
from __future__ import annotations

import dataclasses
import glob
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

from ti5_isaacgym_tpu.utils.jax_setup import setup_jax

setup_jax()


def top_ops(logdir, k=40):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        print("no xplane found under", logdir)
        return
    data, _ = rttd.xspace_to_tool_data(files, "hlo_stats", {})
    import csv as _csv
    import io
    rows = list(_csv.reader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
    hdr = rows[0]
    try:
        i_cat = hdr.index("HLO op category")
        i_self = hdr.index("Total self time (us)")
        i_name = hdr.index("HLO op expression")
    except ValueError:
        print(hdr)
        return
    agg = {}
    for r in rows[1:]:
        if len(r) <= max(i_cat, i_self):
            continue
        try:
            t = float(r[i_self])
        except ValueError:
            continue
        agg.setdefault(r[i_cat], [0.0, 0])[0] += t
        agg[r[i_cat]][1] += 1
    print("== by category (self us, #ops) ==")
    for cat, (t, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"  {t:12.0f} us  {c:5d} ops   {cat}")
    print(f"== top {k} ops by self time ==")
    big = sorted((r for r in rows[1:] if len(r) > max(i_self, i_name)),
                 key=lambda r: -float(r[i_self] or 0))[:k]
    for r in big:
        print(f"  {float(r[i_self]):10.0f} us  {r[i_name][:150]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    what = sys.argv[2] if len(sys.argv) > 2 else "update"
    from ti5_isaacgym_tpu.algo.rollout import compute_gae
    from ti5_isaacgym_tpu.algo.runner import OnPolicyRunner
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

    cfg = T1EnvCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=n))
    env = T1DHStandEnv(cfg)
    runner = OnPolicyRunner(env, cfg, T1TrainCfg(), log_dir=None)
    carry = runner.init_carry()
    alg, pcfg, T = runner.alg, runner.ppo_cfg, runner.num_steps_per_env

    if what == "full":
        fn = runner._iter_fn
        args = (carry,)
    elif what == "rollout":
        def rollout(carry):
            params = carry.ts.params

            def step(c, _):
                env_state, obs, priv, rng, cur_rew, cur_len = c
                rng, k_act = jax.random.split(rng)
                action, logp, mu, sigma, value = alg.act(params, obs, priv, k_act)
                env_state, obs2, priv2, rew, done, extras = env.step(env_state, action)
                return (env_state, obs2, priv2, rng, cur_rew, cur_len), rew

            c0 = (carry.env_state, carry.obs, carry.priv_obs, carry.rng,
                  carry.cur_reward_sum, carry.cur_ep_len)
            return jax.lax.scan(step, c0, None, length=T)
        fn = jax.jit(rollout)
        args = (carry,)
    else:
        # build a real traj by running the rollout once, then profile update
        from ti5_isaacgym_tpu.algo.rollout import Transition

        def rollout_gae(carry):
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
            last_values = alg.value(params, c1[2])
            returns, advantages = compute_gae(traj, last_values, pcfg.gamma, pcfg.lam)
            return traj, returns, advantages

        traj, returns, advantages = jax.jit(rollout_gae)(carry)
        jax.block_until_ready(returns)
        key = jax.random.PRNGKey(7)
        fn = jax.jit(lambda ts, tr, re, ad, k: alg.update(ts, tr, re, ad, k))
        args = (carry.ts, traj, returns, advantages, key)

    # warmup/compile
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])

    logdir = tempfile.mkdtemp(prefix=f"prof_{what}_{n}_")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{what} N={n}: {(time.perf_counter()-t0)/5*1e3:.2f} ms/call")
    top_ops(logdir)


if __name__ == "__main__":
    main()
