#!/usr/bin/env python3
"""Isolate PPO-update residual costs: the T*N random permutation (sort-based
on TPU), the per-minibatch optimizer machinery, and a shuffle-once update
variant (one gather pass into [M,B,...], static-sliced minibatches).

Usage: python tools/microbench_update2.py [N ...]
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
        total = T * n
        # --- permutation alone ---
        perm = jax.jit(lambda k: jax.random.permutation(k, total))
        t_perm = timeit(perm, key)
        print(f"N={n}: permutation({total})      : {t_perm*1e3:8.2f} ms")

        # --- optimizer machinery alone: 8 value_and_grad-free adam steps ---
        ts = init_train_state(cfg, params)
        grads = jax.tree.map(jnp.ones_like, params)

        @jax.jit
        def adam8(ts, grads):
            def one(ts, _):
                updates, opt_state = alg.optimizer.update(grads, ts.opt_state,
                                                          ts.params)
                updates = jax.tree.map(lambda u: -ts.lr * u, updates)
                import optax
                p = optax.apply_updates(ts.params, updates)
                return ts.replace(params=p, opt_state=opt_state), None
            return jax.lax.scan(one, ts, None, length=8)[0]

        t_adam = timeit(adam8, ts, grads)
        print(f"       adam x8 (no fwd/bwd)    : {t_adam*1e3:8.2f} ms")

        # --- gather variants on the big obs array ---
        obs = jax.random.normal(key, (total, 3102), jnp.bfloat16)

        @jax.jit
        def gather_per_mb(obs, k):
            idx = jax.random.permutation(k, total).reshape(4, total // 4)

            def one(acc, mb_idx):
                return acc + obs[mb_idx].astype(jnp.float32).sum(), None

            def epoch(acc, _):
                return jax.lax.scan(one, acc, idx)[0], None

            return jax.lax.scan(epoch, jnp.zeros(()), None, length=2)[0]

        t_g1 = timeit(gather_per_mb, obs, key, iters=5)
        print(f"       gather per-mb (2 ep)    : {t_g1*1e3:8.2f} ms")

        @jax.jit
        def shuffle_once(obs, k):
            idx = jax.random.permutation(k, total)
            shuf = obs[idx].reshape(4, total // 4, 3102)

            def one(acc, mb):
                return acc + mb.astype(jnp.float32).sum(), None

            def epoch(acc, _):
                return jax.lax.scan(one, acc, shuf)[0], None

            return jax.lax.scan(epoch, jnp.zeros(()), None, length=2)[0]

        t_g2 = timeit(shuffle_once, obs, key, iters=5)
        print(f"       shuffle-once (2 ep)     : {t_g2*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
