"""Impact/limit fidelity regressions for the contact + joint-stop model.

These lock in the round-2 physics fixes (see BASELINE.md "Round-2
physics-fidelity findings"): hard joint stops, collective-mass implicit
contact, and the PhysX maxDepenetrationVelocity cap.  Failure modes they
guard against: policies sitting on limit-penalty springs beyond the URDF
stops, pogo-bouncing landings (9 kN spikes), and deep-penetration launches.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def quiet_env():
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

    cfg = T1EnvCfg()
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=8),
        terrain=dataclasses.replace(cfg.terrain, mesh_type="plane"),
        domain_rand=dataclasses.replace(
            cfg.domain_rand,
            randomize_friction=False, randomize_base_mass=False,
            randomize_com=False, randomize_link_mass=False,
            randomize_gains=False, randomize_torque=False,
            randomize_motor_offset=False, randomize_joint_armature=False,
            add_lag=False, add_dof_lag=False, add_imu_lag=False,
            push_robots=False, add_ext_force=False),
        noise=dataclasses.replace(cfg.noise, add_noise=False))
    return T1DHStandEnv(cfg)


def _rollout(env, n_steps, actions_fn):
    key = jax.random.PRNGKey(3)
    state, obs, priv = jax.jit(lambda k: env.reset(env.init_state(k)))(key)
    step = jax.jit(env.step)
    traj = []
    for i in range(n_steps):
        a = actions_fn(i, state)
        state, obs, priv, rew, done, ex = step(state, a)
        traj.append((np.asarray(state.phys.base_pos[:, 2]),
                     np.asarray(state.contact_forces[:, list(env.model.feet_bodies), 2]),
                     np.asarray(done)))
    return state, traj


@pytest.mark.slow
def test_landing_is_dead_beat(quiet_env):
    """Drop from spawn under default-pose PD: contact forces must stay in
    the hundreds of newtons (no ~9 kN impact spikes) and the first second
    must not re-launch the base upward (no pogo)."""
    env = quiet_env
    n = 8
    zero = jnp.zeros((n, env.num_actions))
    state, traj = _rollout(env, 100, lambda i, s: zero)
    fz_max = max(float(f.max()) for _, f, _ in traj)
    # weight is ~547 N; a stiff-legged drop transient of a few kN is
    # physical, the broken model spiked ~9 kN and then pogoed
    assert fz_max < 5000.0, f"impact spike {fz_max:.0f} N"
    # no env may end the first second HIGHER than it was at 0.2 s unless it
    # was reset in between (reset re-spawns at ~0.95)
    z20 = traj[19][0]
    z99 = traj[99][0]
    any_reset = np.any([d for _, _, d in traj[20:]], axis=0)
    rose = (z99 > z20 + 0.05) & ~any_reset
    assert not rose.any(), f"passive pogo: z rose {z20} -> {z99}"


@pytest.mark.slow
def test_hard_joint_stops(quiet_env):
    """Max-torque actions cannot push joints materially past the URDF
    limits (PhysX holds them as rigid constraints)."""
    env = quiet_env
    n = 8
    # saturating actions alternate sign to slam both stops
    big = jnp.full((n, env.num_actions), 100.0)

    def act(i, s):
        return big if (i // 20) % 2 == 0 else -big

    state, traj = _rollout(env, 80, act)
    lo = np.asarray(env.model.dof_lower)
    hi = np.asarray(env.model.dof_upper)
    q = np.asarray(state.phys.qpos)
    assert (q <= hi + 1e-4).all() and (q >= lo - 1e-4).all(), (
        f"joint beyond hard stop: {q.min(0)} vs {lo}, {q.max(0)} vs {hi}")
