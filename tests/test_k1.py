"""Second robot asset (K1) end-to-end: model spec -> engine -> task env."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti5_isaacgym_tpu.utils.registry import task_registry


def test_k1_registered_and_distinct():
    env_cfg, train_cfg = task_registry.get_cfgs("k1_dh_stand")
    assert env_cfg.asset.model_spec == "k1_model.json"
    assert train_cfg.runner.experiment_name == "k1_dh_stand"

    from ti5_isaacgym_tpu.physics.model import load
    import os

    res = os.path.join(os.path.dirname(task_registry.__init__.__module__) or ".",)
    base = os.path.join(os.path.dirname(__file__), "..", "ti5_isaacgym_tpu",
                        "resources")
    k1 = load(os.path.abspath(os.path.join(base, "k1_model.json")))
    t1 = load(os.path.abspath(os.path.join(base, "t1_model.json")))
    assert k1.nb == 13 and k1.num_dof == 12
    # genuinely different robot: masses and joint frames differ
    assert abs(float(k1.mass.sum()) - float(t1.mass.sum())) > 1.0
    assert not np.allclose(np.asarray(k1.joint_pos), np.asarray(t1.joint_pos))
    assert k1.dof_names[0] == "leg_l1_joint"


@pytest.mark.slow
def test_k1_stands_under_pd():
    """K1 must stand under the PD law at the default pose — the engine
    consumes the new model spec end to end (FK, contact, ABA)."""
    env_cfg, _ = task_registry.get_cfgs("k1_dh_stand")
    env_cfg = dataclasses.replace(
        env_cfg,
        env=dataclasses.replace(env_cfg.env, num_envs=4),
        terrain=dataclasses.replace(env_cfg.terrain, mesh_type="plane"),
        noise=dataclasses.replace(env_cfg.noise, add_noise=False),
        domain_rand=dataclasses.replace(
            env_cfg.domain_rand, push_robots=False, add_ext_force=False,
            randomize_base_mass=False, randomize_com=False,
            randomize_link_mass=False, randomize_gains=False,
            randomize_torque=False, randomize_motor_offset=False,
            randomize_coulomb_friction=False),
    )
    env_class = task_registry._get("k1_dh_stand")[0]
    env = env_class(env_cfg, seed=0)

    @jax.jit
    def drive(key):
        s = env.init_state(key)
        s, obs, priv = env.reset(s)

        def body(s, _):
            s, obs, priv, rew, done, ex = env.step(
                s, jnp.zeros((4, env.num_actions)))
            return s, (rew, s.phys.base_pos[:, 2])

        s, (rews, zs) = jax.lax.scan(body, s, None, length=50)
        return obs, rews, zs

    obs, rews, zs = drive(jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert bool(jnp.all(jnp.isfinite(rews)))
    # stays upright near the K1 standing height (~1.05 m), never T1's 0.95
    final_z = np.asarray(zs[-1])
    assert (final_z > 0.95).all() and (final_z < 1.15).all(), final_z
