"""CLI argument parsing + seeding (reference ``humanoid/utils/helpers.py``)."""
from __future__ import annotations

import argparse
import random

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("ti5_isaacgym_tpu")
    p.add_argument("--task", type=str, default="t1_dh_stand")
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max_iterations", type=int, default=None)
    p.add_argument("--resume", action="store_true", default=None)
    p.add_argument("--experiment_name", type=str, default=None)
    p.add_argument("--run_name", type=str, default=None)
    p.add_argument("--load_run", type=str, default=None)
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--headless", action="store_true", default=True)
    p.add_argument("--use_ref_actions", type=int, default=None, choices=(0, 1),
                   help="override cfg.env.use_ref_actions (gait bootstrap)")
    p.add_argument("--reward_scales", type=str, default=None,
                   help="comma list of name=scale overrides for "
                        "cfg.rewards.scales (shaping phases), e.g. "
                        "'feet_air_time=8,feet_clearance=4'")
    p.add_argument("--log_root", type=str, default=None)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard envs + DP learner over this many devices "
                        "(jax.sharding mesh; default single-device)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of iterations "
                        "3-5 into DIR (open with TensorBoard/XProf)")
    # multi-host bring-up (SURVEY §5.8; exercised 2-process by
    # tests/test_parallel.py::test_multihost_two_process_update).  On TPU
    # pods jax.distributed.initialize() autodetects all three from the
    # environment, so --coordinator alone (or none) is typical there.
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port for "
                        "jax.distributed.initialize (multi-host training)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total number of processes in the multi-host job")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's index in the multi-host job")
    return p.parse_args(argv)


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
