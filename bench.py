#!/usr/bin/env python3
"""Canonical benchmark: t1_dh_stand training throughput on one chip.

Prints ONE JSON line:
  {"metric": "env_steps_per_s_per_chip", "value": N, "unit": "env-steps/s",
   "vs_baseline": N / 100000}

The metric is full-pipeline training throughput (physics + obs/reward +
DH-PPO update) in policy env-steps per second at the driver-defined config.
The reference publishes no numbers (BASELINE.md); the 100k env-steps/s
denominator is the typical single-GPU legged-gym figure at this task scale
and stands in as the parity bar.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time


def main():
    # BASELINE.json defines the driver metric at 8192 envs (the reference's
    # advertised scale, README.md:24); 4096 remains available via env var.
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "8192"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    warmup = int(os.environ.get("BENCH_WARMUP", "2"))

    import jax

    from ti5_isaacgym_tpu.utils.jax_setup import setup_jax

    # donated carry: XLA aliases the large env-state/history buffers in
    # place (round-5: 1,253k -> 1,283k env-steps/s @8192; 60-iteration live
    # training validated).  Production entry points only — tests/tools may
    # legitimately reuse a carry after passing it to the iteration, which
    # donation invalidates.
    os.environ.setdefault("TI5_DONATE_CARRY", "1")
    setup_jax()

    from ti5_isaacgym_tpu.algo.runner import OnPolicyRunner
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

    cfg = T1EnvCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=num_envs))
    env = T1DHStandEnv(cfg)
    runner = OnPolicyRunner(env, cfg, T1TrainCfg(), log_dir=None)
    carry = runner.init_carry()
    it = runner._iter_fn
    for _ in range(warmup):
        carry, metrics = it(carry)
    jax.block_until_ready((carry, metrics))
    steps = iters * num_envs * runner.num_steps_per_env

    def timed_window(c, fetch_each=False):
        t0 = time.time()
        m = None
        for _ in range(iters):
            c, m = it(c)
            if fetch_each:
                float(jax.device_get(m["kl"]))
        # a VALUE fetch, not block_until_ready: round-4/5 flakes showed
        # block_until_ready transiently returning early through the remote
        # tunnel, but a device_get cannot produce bytes before the compute
        float(jax.device_get(m["kl"]))
        return steps / (time.time() - t0), c

    # An iteration of this program is >= 50 ms on any real backend, so rates
    # above 20 M steps/s are physically impossible; retry with per-iteration
    # value fetches, which cannot under-measure.  Each window continues from
    # the last carry — the donated input buffers are consumed by the call.
    rate, carry = timed_window(carry)
    for _ in range(3):
        if rate < 20e6:
            break
        rate, carry = timed_window(carry, fetch_each=True)
    result = {
        "metric": "env_steps_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / 100000.0, 4),
    }
    if rate >= 20e6:
        # still physically impossible after the retries: publish the number
        # as INVALID rather than as the canonical metric (ADVICE r4)
        result["error"] = "timing invalid: rate exceeds physical bound after retries"
        print(json.dumps(result))
        return 1
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
