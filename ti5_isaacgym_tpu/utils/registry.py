"""Task registry (reference ``humanoid/utils/task_registry.py``).

Maps a task name to (env class, env cfg, train cfg) and provides the
``make_env`` / ``make_alg_runner`` factories the CLI scripts consume.
"""
from __future__ import annotations

import dataclasses
import os
from datetime import datetime
from typing import Callable, Dict, Optional, Tuple

from ..algo.runner import OnPolicyRunner
from ..configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
from .config import update_cfg_from_args

LEGGED_GYM_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


class TaskRegistry:
    def __init__(self):
        self._tasks: Dict[str, Tuple[Callable, object, object]] = {}

    def register(self, name: str, env_class, env_cfg, train_cfg):
        self._tasks[name] = (env_class, env_cfg, train_cfg)

    def _get(self, name: str):
        if name not in self._tasks:
            raise KeyError(
                f"unknown task {name!r}; registered tasks: {', '.join(self.task_names())}")
        return self._tasks[name]

    def get_cfgs(self, name: str):
        _, env_cfg, train_cfg = self._get(name)
        return env_cfg, train_cfg

    def task_names(self):
        return sorted(self._tasks)

    def make_env(self, name: str, args=None, env_cfg=None):
        env_class, default_cfg, train_cfg = self._get(name)
        if env_cfg is None:
            env_cfg = default_cfg
        env_cfg, _ = update_cfg_from_args(env_cfg, train_cfg, args)
        seed = getattr(args, "seed", None)
        env = env_class(env_cfg, seed=seed if seed is not None else train_cfg.seed)
        return env, env_cfg

    def make_alg_runner(self, env, name: str, args=None, train_cfg=None,
                        log_root: Optional[str] = None):
        _, env_cfg_default, default_train = self._get(name)
        if train_cfg is None:
            train_cfg = default_train
        _, train_cfg = update_cfg_from_args(None, train_cfg, args)
        env_cfg = getattr(env, "cfg", env_cfg_default)
        if log_root is None:
            log_root = os.path.join(LEGGED_GYM_ROOT, "logs", train_cfg.runner.experiment_name)
        stamp = datetime.now().strftime("%b%d_%H-%M-%S")
        # multi-host: every rank must agree on the run directory (orbax
        # checkpoint saves are collective over a SHARED path) — rank 0's
        # wall-clock stamp is published through the coordination KV store
        from jax._src import distributed as _dist

        _client = getattr(_dist.global_state, "client", None)
        if _client is not None:
            if _dist.global_state.process_id == 0:
                _client.key_value_set("ti5_run_stamp", stamp)
            stamp = _client.blocking_key_value_get("ti5_run_stamp", 60_000)
        log_dir = os.path.join(
            log_root, stamp + "_" + train_cfg.runner.run_name)
        runner = OnPolicyRunner(env, env_cfg, train_cfg, log_dir=log_dir)
        if train_cfg.runner.resume:
            path = resolve_load_path(log_root, train_cfg.runner.load_run,
                                     train_cfg.runner.checkpoint)
            if path:
                print(f"resuming from {path}")
                runner._resume_path = path
        return runner, train_cfg


def resolve_load_path(root: str, load_run=-1, checkpoint=-1) -> Optional[str]:
    """Latest-run/latest-model resolution (reference ``helpers.py:94-123``)."""
    if not os.path.isdir(root):
        return None
    # newest-by-mtime, not lexicographic: run dirs are named by an
    # alphabetic month token (Aug21_...) which misorders across month/year
    # boundaries (Dec < Feb).  The reference sorts lexicographically and has
    # the same latent bug (helpers.py:100-105).
    runs = sorted(
        (d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))),
        key=lambda d: os.path.getmtime(os.path.join(root, d)))
    if not runs:
        return None

    def models_in(run_dir):
        # only completed checkpoints: orbax writes in-flight saves as
        # `model_N.orbax-checkpoint-tmp...` dirs, which an eval racing a
        # live trainer must skip (and must not crash the int parse on)
        named = []
        for d in os.listdir(run_dir):
            if not d.startswith("model_"):
                continue
            try:
                named.append((int(d.split("_")[1]), d))
            except ValueError:
                continue
        return [d for _, d in sorted(named)]

    if load_run in (-1, "-1", None):
        # newest run that actually HAS checkpoints: the caller's own
        # freshly-created (empty) run dir must not shadow the resume target
        candidates = [os.path.join(root, r) for r in reversed(runs)]
        run_dir = next((d for d in candidates if models_in(d)), None)
        if run_dir is None:
            return None
    else:
        run_dir = os.path.join(root, str(load_run))
        if not os.path.isdir(run_dir):
            return None
    models = models_in(run_dir)
    if not models:
        return None
    model = models[-1] if checkpoint in (-1, "-1", None) else f"model_{checkpoint}"
    return os.path.join(run_dir, model)


task_registry = TaskRegistry()


def _register_builtin():
    from ..envs.t1_dh_stand import T1DHStandEnv

    task_registry.register("t1_dh_stand", T1DHStandEnv, T1EnvCfg(), T1TrainCfg())
    # minimum end-to-end slice (SURVEY §7): flat terrain, no DR/lag, vanilla
    # PPO on the same robot — the driver's "1024 envs, flat, single chip" config
    flat_env = dataclasses.replace(
        T1EnvCfg(),
        env=dataclasses.replace(T1EnvCfg().env, num_envs=1024),
        terrain=dataclasses.replace(T1EnvCfg().terrain, mesh_type="plane", curriculum=False),
        domain_rand=dataclasses.replace(
            T1EnvCfg().domain_rand,
            randomize_friction=False, randomize_base_mass=False, randomize_com=False,
            randomize_link_mass=False, randomize_gains=False, randomize_torque=False,
            randomize_motor_offset=False, randomize_coulomb_friction=False,
            add_lag=False, add_dof_lag=False, add_imu_lag=False, add_ext_force=False),
        noise=dataclasses.replace(T1EnvCfg().noise, add_noise=False),
    )
    task_registry.register("t1_flat", T1DHStandEnv, flat_env, T1TrainCfg())
    # second robot asset (K1): same env class, different model/config — the
    # asset pipeline (URDF -> extract_model.py -> model spec) end to end
    from ..configs.k1_dh_stand import k1_env_cfg, k1_train_cfg

    task_registry.register("k1_dh_stand", T1DHStandEnv, k1_env_cfg(), k1_train_cfg())


_register_builtin()
