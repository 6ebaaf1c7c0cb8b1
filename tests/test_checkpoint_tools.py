"""Cross-round checkpoint persistence: full save -> slim -> graft-resume.

The slim checkpoint (tools/slim_checkpoint.py) is the git-committed form that
survives machine re-images between work sessions; resume grafts it onto a
fresh carry (tools/resume_migrate.py), keeping params/optimizer/LR/curriculum
and re-initializing the rest.
"""
import dataclasses
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(ROOT, "tools"))


@pytest.fixture(scope="module")
def tiny_runner():
    from ti5_isaacgym_tpu.algo.runner import OnPolicyRunner
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg, T1TrainCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

    cfg = T1EnvCfg()
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, num_envs=8),
        terrain=dataclasses.replace(cfg.terrain, mesh_type="plane"))
    env = T1DHStandEnv(cfg)
    return OnPolicyRunner(env, cfg, T1TrainCfg(), log_dir=None)


@pytest.mark.slow
def test_slim_roundtrip(tiny_runner, tmp_path):
    from resume_migrate import graft

    runner = tiny_runner
    carry = runner.init_carry()
    carry, _ = runner._iter_fn(carry)
    runner.iteration_count = 1
    full = runner.save(carry, path=str(tmp_path / "model_1"))

    out = str(tmp_path / "slim_1")
    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "slim_checkpoint.py"),
                    full, out],
                   check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})

    import orbax.checkpoint as ocp
    raw = ocp.PyTreeCheckpointer().restore(out)
    fresh = runner.init_carry()
    ts = fresh.ts.replace(params=graft(fresh.ts.params, raw["params"]),
                          opt_state=graft(fresh.ts.opt_state, raw["opt_state"]),
                          lr=graft(fresh.ts.lr, raw["lr"]))
    env_state = graft(fresh.env_state, raw["env_state"])
    resumed = fresh._replace(ts=ts, env_state=env_state)

    # learning state round-trips exactly
    ok = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(jnp.allclose(a, b)), carry.ts.params, resumed.ts.params))
    assert ok
    assert int(raw["iteration"]) == 1
    # curriculum fields survive; big buffers are re-initialized fresh
    assert (resumed.env_state.terrain_level == carry.env_state.terrain_level).all()
    assert (resumed.env_state.common_step == carry.env_state.common_step).all()
    # the grafted carry still trains
    nxt, metrics = runner._iter_fn(resumed)
    assert bool(jnp.isfinite(metrics["value_loss"]))
