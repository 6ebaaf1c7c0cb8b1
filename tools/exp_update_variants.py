#!/usr/bin/env python3
"""PPO-update restructuring experiments (round-4 perf lever).

The op-level profile (tools/profile_update.py) showed the 8192-env update is
dominated by redundant layout passes over the [T*N, 3102] bf16 obs batch:
traj transpose -> shuffle gather -> scan-layout copy -> per-minibatch
dynamic-slice -> per-minibatch transposes into the B-minor layouts the
conv/matmul kernels want.  Each variant below removes some of those passes;
all keep the SAME permutation and minibatch order as the shipped update, so
they are numerically equivalent (asserted vs v0).

Usage: python tools/exp_update_variants.py [N] [variant ...]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    which = set(sys.argv[2:]) or {"v0", "v1", "v2", "v3"}
    import optax

    from ti5_isaacgym_tpu.algo import networks as nets
    from ti5_isaacgym_tpu.algo.ppo import TrainState
    from ti5_isaacgym_tpu.algo.rollout import (Transition, compute_gae,
                                               flatten_batch,
                                               minibatch_indices)
    from ti5_isaacgym_tpu.algo.runner import OnPolicyRunner
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

    print(f"devices: {jax.devices()}  N={n}")
    cfg = T1EnvCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=n))
    env = T1DHStandEnv(cfg)
    runner = OnPolicyRunner(env, cfg, T1TrainCfg(), log_dir=None)
    carry = runner.init_carry()
    alg, pcfg, T = runner.alg, runner.ppo_cfg, runner.num_steps_per_env

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
    ts0 = carry.ts
    cfgp = alg.cfg
    M, E = cfgp.num_mini_batches, cfgp.num_learning_epochs

    def mb_step(ts, mb, mb_ret, mb_adv):
        (loss, aux), grads = jax.value_and_grad(alg._loss, has_aux=True)(
            ts.params, mb, mb_ret, mb_adv)
        surrogate_loss, v_loss, est_loss, mu_new, sigma_new = aux
        lr = ts.lr
        kl_mean = jnp.mean(nets.gaussian_kl(mb.mu, mb.sigma, mu_new, sigma_new))
        lr = jnp.where(kl_mean > cfgp.desired_kl * 2.0,
                       jnp.maximum(cfgp.min_lr, lr / 1.5), lr)
        lr = jnp.where((kl_mean < cfgp.desired_kl / 2.0) & (kl_mean > 0.0),
                       jnp.minimum(cfgp.max_lr, lr * 1.5), lr)
        updates, opt_state = alg.optimizer.update(grads, ts.opt_state, ts.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params=params, opt_state=opt_state, lr=lr,
                          update_count=ts.update_count + 1), v_loss

    # --- v0: shipped update ------------------------------------------------
    def v0(ts, traj, returns, advantages, key):
        return alg.update(ts, traj, returns, advantages, key)

    # --- v1: same dataflow, minibatch/epoch loops python-unrolled ---------
    def v1(ts, traj, returns, advantages, key):
        flat = flatten_batch(traj)._replace(rewards=None, dones=None)
        flat_ret = returns.reshape(-1)
        flat_adv = advantages.reshape(-1)
        total = flat_ret.shape[0]
        fidx = minibatch_indices(key, total, M).reshape(-1)
        B = total // M
        g = jax.tree.map(lambda x: x[fidx], flat)
        g_ret, g_adv = flat_ret[fidx], flat_adv[fidx]
        vls = []
        for _ in range(E):
            for b in range(M):
                sl = lambda x: jax.lax.slice_in_dim(x, b * B, (b + 1) * B, axis=0)
                ts, vl = mb_step(ts, jax.tree.map(sl, g), sl(g_ret), sl(g_adv))
                vls.append(vl)
        return ts, {"value_loss": jnp.stack(vls).mean()}

    # --- v2: v1 + gather straight out of the [T, N, ...] traj (no flatten
    # transpose) ------------------------------------------------------------
    def v2(ts, traj, returns, advantages, key):
        total = T * n
        fidx = minibatch_indices(key, total, M).reshape(-1)
        t_idx, n_idx = fidx // n, fidx % n
        B = total // M
        pick = lambda x: x[t_idx, n_idx]
        g = jax.tree.map(pick, traj._replace(rewards=None, dones=None))
        g_ret, g_adv = pick(returns), pick(advantages)
        vls = []
        for _ in range(E):
            for b in range(M):
                sl = lambda x: jax.lax.slice_in_dim(x, b * B, (b + 1) * B, axis=0)
                ts, vl = mb_step(ts, jax.tree.map(sl, g), sl(g_ret), sl(g_adv))
                vls.append(vl)
        return ts, {"value_loss": jnp.stack(vls).mean()}

    # --- v3: v2 but the two big gathers emit TRANSPOSED (feature-major)
    # copies, minibatches are lane slices, and the loss consumes the
    # transposed view (aiming for the B-minor layouts the conv/matmuls
    # already want, without per-minibatch transposes) ------------------------
    def v3(ts, traj, returns, advantages, key):
        total = T * n
        fidx = minibatch_indices(key, total, M).reshape(-1)
        t_idx, n_idx = fidx // n, fidx % n
        B = total // M
        pick = lambda x: x[t_idx, n_idx]
        small = jax.tree.map(
            pick, Transition(obs=None, critic_obs=None, rewards=None, dones=None,
                             actions=traj.actions, values=traj.values,
                             log_probs=traj.log_probs, mu=traj.mu, sigma=traj.sigma))
        obs_t = traj.obs[t_idx, n_idx].T          # [3102, T*N]
        crit_t = traj.critic_obs[t_idx, n_idx].T  # [657, T*N]
        g_ret, g_adv = pick(returns), pick(advantages)
        vls = []
        for _ in range(E):
            for b in range(M):
                sl = lambda x: jax.lax.slice_in_dim(x, b * B, (b + 1) * B, axis=0)
                slT = lambda x: jax.lax.slice_in_dim(x, b * B, (b + 1) * B, axis=1)
                mb = small._replace(obs=slT(obs_t).T, critic_obs=slT(crit_t).T,
                                    actions=sl(small.actions), values=sl(small.values),
                                    log_probs=sl(small.log_probs), mu=sl(small.mu),
                                    sigma=sl(small.sigma))
                ts, vl = mb_step(ts, mb, sl(g_ret), sl(g_adv))
                vls.append(vl)
        return ts, {"value_loss": jnp.stack(vls).mean()}

    # --- v1p: v1 + ALL small per-sample tensors packed into one [T*N, 40]
    # f32 row-gather (4 separate 1-D gathers cost ~1.7 ms EACH: element
    # gathers scalarize on TPU) ---------------------------------------------
    def v1p(ts, traj, returns, advantages, key):
        flat = flatten_batch(traj)._replace(rewards=None, dones=None)
        total = T * n
        fidx = minibatch_indices(key, total, M).reshape(-1)
        B = total // M
        packed = jnp.concatenate([
            flat.actions, flat.mu, flat.sigma,
            flat.values[:, None], flat.log_probs[:, None],
            returns.reshape(-1, 1), advantages.reshape(-1, 1)], axis=1)
        g_small = packed[fidx]
        g_obs = flat.obs[fidx]
        g_crit = flat.critic_obs[fidx]
        na = flat.actions.shape[1]
        vls = []
        for _ in range(E):
            for b in range(M):
                sl = lambda x: jax.lax.slice_in_dim(x, b * B, (b + 1) * B, axis=0)
                sm = sl(g_small)
                mb = Transition(
                    obs=sl(g_obs), critic_obs=sl(g_crit),
                    actions=sm[:, :na], mu=sm[:, na:2 * na],
                    sigma=sm[:, 2 * na:3 * na], values=sm[:, 3 * na],
                    log_probs=sm[:, 3 * na + 1], rewards=None, dones=None)
                ts, vl = mb_step(ts, mb, sm[:, 3 * na + 2], sm[:, 3 * na + 3])
                vls.append(vl)
        return ts, {"value_loss": jnp.stack(vls).mean()}

    # --- v5: NO gather at all — minibatch b = env block [b*N/M, (b+1)*N/M)
    # across all T steps (different minibatch statistics from the reference's
    # flat permutation; ceiling measurement, not shipped) --------------------
    def v5(ts, traj, returns, advantages, key):
        NB = n // M
        vls = []
        for _ in range(E):
            for b in range(M):
                sl = lambda x: jax.lax.slice_in_dim(
                    x, b * NB, (b + 1) * NB, axis=1).reshape(
                        (T * NB,) + x.shape[2:])
                mb = Transition(
                    obs=sl(traj.obs), critic_obs=sl(traj.critic_obs),
                    actions=sl(traj.actions), mu=sl(traj.mu),
                    sigma=sl(traj.sigma), values=sl(traj.values),
                    log_probs=sl(traj.log_probs), rewards=None, dones=None)
                ts, vl = mb_step(ts, mb, sl(returns), sl(advantages))
                vls.append(vl)
        return ts, {"value_loss": jnp.stack(vls).mean()}

    # --- v1s: v1p + ascending order WITHIN each minibatch chunk (same
    # partition as the reference permutation; a minibatch is consumed as a
    # mean, so within-chunk order is algorithmically irrelevant — but an
    # ascending gather turns random row reads into 4 interleaved sequential
    # streams) --------------------------------------------------------------
    def v1s(ts, traj, returns, advantages, key):
        flat = flatten_batch(traj)._replace(rewards=None, dones=None)
        total = T * n
        fidx = jnp.sort(minibatch_indices(key, total, M), axis=1).reshape(-1)
        B = total // M
        packed = jnp.concatenate([
            flat.actions, flat.mu, flat.sigma,
            flat.values[:, None], flat.log_probs[:, None],
            returns.reshape(-1, 1), advantages.reshape(-1, 1)], axis=1)
        g_small = packed[fidx]
        g_obs = flat.obs[fidx]
        g_crit = flat.critic_obs[fidx]
        na = flat.actions.shape[1]
        vls = []
        for _ in range(E):
            for b in range(M):
                sl = lambda x: jax.lax.slice_in_dim(x, b * B, (b + 1) * B, axis=0)
                sm = sl(g_small)
                mb = Transition(
                    obs=sl(g_obs), critic_obs=sl(g_crit),
                    actions=sm[:, :na], mu=sm[:, na:2 * na],
                    sigma=sm[:, 2 * na:3 * na], values=sm[:, 3 * na],
                    log_probs=sm[:, 3 * na + 1], rewards=None, dones=None)
                ts, vl = mb_step(ts, mb, sm[:, 3 * na + 2], sm[:, 3 * na + 3])
                vls.append(vl)
        return ts, {"value_loss": jnp.stack(vls).mean()}

    # --- v6: packed smalls gathered once; obs/critic gathered PER MINIBATCH
    # straight from the flat traj (2x gather traffic, but the per-mb gather
    # output can fuse into the conv/matmul layout with no intermediate
    # materialization) ------------------------------------------------------
    def v6(ts, traj, returns, advantages, key):
        flat = flatten_batch(traj)._replace(rewards=None, dones=None)
        total = T * n
        fidx = minibatch_indices(key, total, M).reshape(-1)
        B = total // M
        packed = jnp.concatenate([
            flat.actions, flat.mu, flat.sigma,
            flat.values[:, None], flat.log_probs[:, None],
            returns.reshape(-1, 1), advantages.reshape(-1, 1)], axis=1)
        g_small = packed[fidx]
        na = flat.actions.shape[1]
        vls = []
        for _ in range(E):
            for b in range(M):
                sl = lambda x: jax.lax.slice_in_dim(x, b * B, (b + 1) * B, axis=0)
                sm = sl(g_small)
                bidx = jax.lax.slice_in_dim(fidx, b * B, (b + 1) * B, axis=0)
                mb = Transition(
                    obs=flat.obs[bidx], critic_obs=flat.critic_obs[bidx],
                    actions=sm[:, :na], mu=sm[:, na:2 * na],
                    sigma=sm[:, 2 * na:3 * na], values=sm[:, 3 * na],
                    log_probs=sm[:, 3 * na + 1], rewards=None, dones=None)
                ts, vl = mb_step(ts, mb, sm[:, 3 * na + 2], sm[:, 3 * na + 3])
                vls.append(vl)
        return ts, {"value_loss": jnp.stack(vls).mean()}

    # --- v7: v6 dataflow + feature-major loss forward (networks.
    # loss_forward_T): the minibatch gather emits a transposed [F, B] copy
    # consumed natively by the transposed dense/conv math, so neither the
    # forward re-tiling into B-minor layouts nor the backward's x^T
    # transposes exist ------------------------------------------------------
    def v7(ts, traj, returns, advantages, key):
        flat = flatten_batch(traj)._replace(rewards=None, dones=None)
        total = T * n
        fidx = minibatch_indices(key, total, M).reshape(-1)
        B = total // M
        packed = jnp.concatenate([
            flat.actions, flat.mu, flat.sigma,
            flat.values[:, None], flat.log_probs[:, None],
            returns.reshape(-1, 1), advantages.reshape(-1, 1)], axis=1)
        g_small = packed[fidx]
        na = flat.actions.shape[1]

        def loss_T(params, obsT, critT, actions, values, logp_old, ret, adv):
            mean, std, value, est = nets.loss_forward_T(
                alg.network, params, obsT, critT)
            logp = nets.log_prob(mean, std, actions)
            ent = nets.entropy(std)
            ratio = jnp.exp(logp - logp_old)
            surr = -adv * ratio
            surr_c = -adv * jnp.clip(ratio, 1 - cfgp.clip_param,
                                     1 + cfgp.clip_param)
            s_loss = jnp.mean(jnp.maximum(surr, surr_c))
            v_clip = values + jnp.clip(value - values, -cfgp.clip_param,
                                       cfgp.clip_param)
            v_loss = jnp.maximum(jnp.square(value - ret),
                                 jnp.square(v_clip - ret)).mean()
            ref_vel = jax.lax.dynamic_slice_in_dim(
                critT, cfgp.lin_vel_idx, 3, axis=0).T
            e_loss = jnp.mean(jnp.square(est - ref_vel.astype(est.dtype)))
            loss = (s_loss + cfgp.value_loss_coef * v_loss
                    - cfgp.entropy_coef * ent.mean() + e_loss)
            return loss, (v_loss, mean, std)

        vls = []
        for _ in range(E):
            for b in range(M):
                sl = lambda x: jax.lax.slice_in_dim(x, b * B, (b + 1) * B, axis=0)
                sm = sl(g_small)
                bidx = jax.lax.slice_in_dim(fidx, b * B, (b + 1) * B, axis=0)
                obsT = flat.obs[bidx].T
                critT = flat.critic_obs[bidx].T
                (loss, aux), grads = jax.value_and_grad(loss_T, has_aux=True)(
                    ts.params, obsT, critT, sm[:, :na], sm[:, 3 * na],
                    sm[:, 3 * na + 1], sm[:, 3 * na + 2], sm[:, 3 * na + 3])
                v_loss, mu_new, sigma_new = aux
                lr = ts.lr
                kl_mean = jnp.mean(nets.gaussian_kl(
                    sm[:, na:2 * na], sm[:, 2 * na:3 * na], mu_new, sigma_new))
                lr = jnp.where(kl_mean > cfgp.desired_kl * 2.0,
                               jnp.maximum(cfgp.min_lr, lr / 1.5), lr)
                lr = jnp.where((kl_mean < cfgp.desired_kl / 2.0) & (kl_mean > 0.0),
                               jnp.minimum(cfgp.max_lr, lr * 1.5), lr)
                updates, opt_state = alg.optimizer.update(grads, ts.opt_state,
                                                          ts.params)
                updates = jax.tree.map(lambda u: -lr * u, updates)
                params = optax.apply_updates(ts.params, updates)
                ts = TrainState(params=params, opt_state=opt_state, lr=lr,
                                update_count=ts.update_count + 1)
                vls.append(v_loss)
        return ts, {"value_loss": jnp.stack(vls).mean()}

    # --- v6s: v6 + ascending order WITHIN each minibatch chunk (same
    # partition; a minibatch is consumed as a mean, so within-chunk order
    # only reorders fp accumulation — the sorted gather reads 4 interleaved
    # sequential streams instead of random rows) ----------------------------
    def v6s(ts, traj, returns, advantages, key):
        flat = flatten_batch(traj)._replace(rewards=None, dones=None)
        total = T * n
        fidx = jnp.sort(minibatch_indices(key, total, M), axis=1).reshape(-1)
        B = total // M
        packed = jnp.concatenate([
            flat.actions, flat.mu, flat.sigma,
            flat.values[:, None], flat.log_probs[:, None],
            returns.reshape(-1, 1), advantages.reshape(-1, 1)], axis=1)
        g_small = packed[fidx]
        na = flat.actions.shape[1]
        vls = []
        for _ in range(E):
            for b in range(M):
                sl = lambda x: jax.lax.slice_in_dim(x, b * B, (b + 1) * B, axis=0)
                sm = sl(g_small)
                bidx = jax.lax.slice_in_dim(fidx, b * B, (b + 1) * B, axis=0)
                mb = Transition(
                    obs=flat.obs[bidx], critic_obs=flat.critic_obs[bidx],
                    actions=sm[:, :na], mu=sm[:, na:2 * na],
                    sigma=sm[:, 2 * na:3 * na], values=sm[:, 3 * na],
                    log_probs=sm[:, 3 * na + 1], rewards=None, dones=None)
                ts, vl = mb_step(ts, mb, sm[:, 3 * na + 2], sm[:, 3 * na + 3])
                vls.append(vl)
        return ts, {"value_loss": jnp.stack(vls).mean()}

    import os
    prof = os.environ.get("EXP_PROFILE")
    if prof:
        import tempfile
        fn = jax.jit({"v0": v0, "v1": v1, "v2": v2, "v3": v3, "v1p": v1p, "v5": v5, "v1s": v1s, "v6": v6, "v6s": v6s, "v7": v7}[prof])
        for _ in range(2):
            out = fn(ts0, traj, returns, advantages, key)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        logdir = tempfile.mkdtemp(prefix=f"prof_{prof}_")
        with jax.profiler.trace(logdir):
            for _ in range(3):
                out = fn(ts0, traj, returns, advantages, key)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        print("LOGDIR", logdir)
        return

    ref_params = None
    for name in ["v0", "v1", "v2", "v3", "v1p", "v5", "v1s", "v6", "v6s", "v7"]:
        if name not in which:
            continue
        fn = jax.jit(locals()[name] if name in locals() else None) if False else jax.jit(
            {"v0": v0, "v1": v1, "v2": v2, "v3": v3, "v1p": v1p, "v5": v5, "v1s": v1s, "v6": v6, "v6s": v6s, "v7": v7}[name])
        try:
            t = timeit(fn, ts0, traj, returns, advantages, key)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        out_ts, _ = fn(ts0, traj, returns, advantages, key)
        if ref_params is None:
            ref_params = out_ts.params
            dev = 0.0
        else:
            dev = max(float(jnp.max(jnp.abs(a - b)))
                      for a, b in zip(jax.tree.leaves(ref_params),
                                      jax.tree.leaves(out_ts.params)))
        print(f"{name}: {t*1e3:8.2f} ms   max|dparam| vs v0 = {dev:.3e}")


if __name__ == "__main__":
    main()
