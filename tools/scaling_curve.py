#!/usr/bin/env python3
"""Measure DP-sharding overhead on the virtual CPU mesh (VERDICT r3 #4b).

What this measures and why it is the honest obtainable number on this host:

* True weak scaling needs N physical devices; this host has ONE TPU chip and
  a 2-core CPU.  Virtual CPU devices share those cores, so a classic
  weak-scaling curve (fixed per-shard work) would measure core contention,
  not the framework.
* Instead we hold the TOTAL work constant and vary the shard count
  1/2/4/8 over virtual CPU devices.  The arithmetic is identical in every
  row; any wall-clock delta IS the sharding machinery: shard_map
  partitioning, the gradient/metric psum collectives, per-shard RNG folds.
  If the 8-shard row matches the 1-shard row, the DP path adds ~zero
  overhead at constant resources — the measurable precondition for the
  >=80 % multi-chip efficiency target (BASELINE.md:26).
* The remaining term a real pod adds is the ICI all-reduce itself, which is
  modeled analytically in the report (gradient bytes / ICI bandwidth vs
  measured iteration time) — at this model size it is O(10 us) against an
  O(100 ms) iteration.

  JAX_PLATFORMS=cpu python tools/scaling_curve.py --total_envs 64 --iters 6
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# the axon TPU plugin ignores JAX_PLATFORMS and the tunnel is single-client:
# pin the default device to CPU so this tool can never wedge a training run
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/ti5_jax_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def bench_config(total_envs: int, n_shards: int, iters: int, warmup: int = 2):
    import dataclasses

    import jax

    from ti5_isaacgym_tpu.algo.runner import OnPolicyRunner
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv
    from ti5_isaacgym_tpu.parallel import ShardedRunner, make_mesh

    cfg = T1EnvCfg()
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=total_envs),
        terrain=dataclasses.replace(cfg.terrain, num_rows=2, num_cols=2,
                                    border_size=2.0),
    )
    tcfg = T1TrainCfg()
    env = T1DHStandEnv(cfg)
    runner = OnPolicyRunner(env, cfg, tcfg, log_dir=None)
    if n_shards == 0:                      # plain (unsharded) baseline runner
        carry = runner.init_carry()
        it_fn = runner._iter_fn
    else:
        sharded = ShardedRunner(runner, make_mesh(n_shards, devices=jax.devices("cpu")))
        carry = sharded.shard_carry(sharded.init_carry())
        it_fn = sharded.compile_for(carry)
    for _ in range(warmup):
        carry, metrics = it_fn(carry)
    jax.block_until_ready(metrics)
    t0 = time.time()
    for _ in range(iters):
        carry, metrics = it_fn(carry)
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / iters
    steps = total_envs * tcfg.runner.num_steps_per_env
    return {"shards": n_shards, "total_envs": total_envs,
            "sec_per_iter": dt, "env_steps_per_sec": steps / dt,
            "value_loss": float(metrics["value_loss"])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total_envs", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    rows = []
    for shards in (0, 1, 2, 4, 8):
        r = bench_config(args.total_envs, shards, args.iters)
        label = "plain" if shards == 0 else f"mesh({shards})"
        print(f"{label:>8}: {r['sec_per_iter']*1e3:8.1f} ms/iter "
              f"({r['env_steps_per_sec']:,.0f} env-steps/s), "
              f"value_loss {r['value_loss']:.4f}", flush=True)
        rows.append(r)

    base = rows[0]["sec_per_iter"]
    for r in rows:
        r["overhead_vs_plain_pct"] = 100.0 * (r["sec_per_iter"] / base - 1.0)

    # analytic ICI term for a real pod: bf16 gradient all-reduce per update
    import jax

    import ti5_isaacgym_tpu  # noqa: F401  (sys.path check)
    from ti5_isaacgym_tpu.algo.runner import build_network
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    import jax.numpy as jnp

    cfg, tcfg = T1EnvCfg(), T1TrainCfg()
    net = build_network(tcfg, cfg)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, cfg.env.num_observations)),
                      jnp.zeros((1, cfg.env.num_privileged_obs)))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    grad_mb = n_params * 4 / 1e6
    # v5e ICI ~ 100 GB/s per link; 2x(N-1)/N ring traffic, 8 updates/iter
    # (2 epochs x 4 minibatches)
    allreduce_ms = 2 * grad_mb / 100e3 * 1e3 * 8
    result = {
        "host": "2-core CPU, 8 virtual devices (constant total work)",
        "rows": rows,
        "model_params": n_params,
        "gradient_mb_f32": grad_mb,
        "predicted_ici_allreduce_ms_per_iter_v5e": allreduce_ms,
        "note": "constant-resource overhead measurement; see BASELINE.md",
    }
    with open(os.path.join(ROOT, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print(f"gradient size {grad_mb:.2f} MB f32 ({n_params:,} params); "
          f"predicted ICI all-reduce cost {allreduce_ms:.3f} ms/iter on v5e")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
