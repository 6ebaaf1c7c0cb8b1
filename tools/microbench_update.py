#!/usr/bin/env python3
"""Decompose the PPO update at a given env count: minibatch gather traffic,
loss forward/backward, optimizer step — to find why the update anti-scales
with N (BASELINE.md round-1 note).

Usage: python tools/microbench_update.py [N ...]
"""
from __future__ import annotations

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
    ns = [int(a) for a in sys.argv[1:]] or [4096, 8192]
    from ti5_isaacgym_tpu.algo import networks as nets
    from ti5_isaacgym_tpu.algo.ppo import PPO, PPOConfig, init_train_state
    from ti5_isaacgym_tpu.algo.rollout import Transition

    print(f"devices: {jax.devices()}")
    T = 24
    cfg = PPOConfig()
    net = nets.ActorCriticDH()
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, 66 * 47)), jnp.zeros((1, 219)))
    alg = PPO(cfg, net)

    for n in ns:
        ts = init_train_state(cfg, params)
        k = jax.random.split(key, 8)
        traj = Transition(
            obs=jax.random.normal(k[0], (T, n, 66 * 47), jnp.bfloat16),
            critic_obs=jax.random.normal(k[1], (T, n, 219), jnp.bfloat16),
            actions=jax.random.normal(k[2], (T, n, 12)),
            rewards=jax.random.normal(k[3], (T, n)),
            dones=jnp.zeros((T, n), bool),
            values=jax.random.normal(k[4], (T, n)),
            log_probs=jax.random.normal(k[5], (T, n)),
            mu=jax.random.normal(k[6], (T, n, 12)),
            sigma=jnp.ones((T, n, 12)),
        )
        returns = jax.random.normal(k[7], (T, n))
        adv = jax.random.normal(k[7], (T, n))
        total = T * n
        mb = total // cfg.num_mini_batches

        # full update (traj passed as an arg — baking it into the closure
        # ships the whole buffer inside the remote-compile request)
        upd = jax.jit(lambda ts, traj, returns, adv, key:
                      alg.update(ts, traj, returns, adv, key)[0])
        t_upd = timeit(upd, ts, traj, returns, adv, key, iters=5, warmup=2)

        # gather-only: permute + index the obs arrays exactly as update does
        from ti5_isaacgym_tpu.algo.rollout import (flatten_batch,
                                                   minibatch_indices)

        @jax.jit
        def gather_only(traj, key):
            flat = flatten_batch(traj)
            idx = minibatch_indices(key, total, cfg.num_mini_batches)

            def one(acc, mb_idx):
                m = jax.tree.map(lambda x: x[mb_idx], flat)
                return acc + m.obs.astype(jnp.float32).sum() + m.critic_obs.astype(jnp.float32).sum(), None

            def epoch(acc, _):
                return jax.lax.scan(one, acc, idx)[0], None

            return jax.lax.scan(epoch, jnp.zeros(()), None,
                                length=cfg.num_learning_epochs)[0]

        t_gather = timeit(gather_only, traj, key, iters=5, warmup=2)

        # loss fwd/bwd only on one pre-sliced minibatch, x8 steps
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)
        mb_tr = jax.tree.map(lambda x: x[:mb], flat)
        mb_ret, mb_adv = returns.reshape(-1)[:mb], adv.reshape(-1)[:mb]

        @jax.jit
        def fwdbwd(params, mb_tr, mb_ret, mb_adv):
            def one(acc, _):
                (l, _), g = jax.value_and_grad(alg._loss, has_aux=True)(
                    params, mb_tr, mb_ret, mb_adv)
                return acc + l, None
            return jax.lax.scan(one, jnp.zeros(()), None, length=8)[0]

        t_fb = timeit(fwdbwd, ts.params, mb_tr, mb_ret, mb_adv, iters=5, warmup=2)

        gb = (total * (3102 + 219) * 2 * 2 * cfg.num_learning_epochs) / 1e9
        print(f"N={n} (batch {total}, minibatch {mb}):")
        print(f"  full update              : {t_upd*1e3:8.2f} ms")
        print(f"  obs gathers (2 ep x 4 mb): {t_gather*1e3:8.2f} ms "
              f"(~{gb:.2f} GB r+w -> {gb/t_gather:.0f} GB/s)")
        print(f"  loss fwd+bwd x8          : {t_fb*1e3:8.2f} ms")
        print(f"  residual (adam, misc)    : {(t_upd-t_gather-t_fb)*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
