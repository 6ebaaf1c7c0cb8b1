"""T1 env behavioral invariants: obs layout, resets, termination, phase.

Golden layout values follow SURVEY.md §2.5 / the reference observation
assembly (t1_dh_stand_env.py:368-481).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# one shared full-env compile (~2 min on the 2-core CI host) serves every
# test here — thorough tier; the fast tier covers obs/lag/reward unit paths
# via test_env_surface
pytestmark = pytest.mark.slow

from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg
from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

N = 16


@pytest.fixture(scope="module")
def env():
    cfg = T1EnvCfg()
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=N),
        terrain=dataclasses.replace(cfg.terrain, num_rows=4, num_cols=4, border_size=5.0),
    )
    return T1DHStandEnv(cfg)


@pytest.fixture(scope="module")
def stepped(env):
    state = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    state, obs, priv, rew, done, extras = step(state, jnp.zeros((N, 12)))
    return env, step, state, obs, priv, rew, done, extras


def test_shapes(stepped):
    env, step, state, obs, priv, rew, done, extras = stepped
    assert obs.shape == (N, 66 * 47)
    assert priv.shape == (N, 3 * 73)
    assert rew.shape == (N,)
    assert done.shape == (N,)
    assert state.episode_sums.shape == (N, env.n_rewards)


def test_privileged_linvel_slice(stepped):
    """lin_vel_idx = 73*2 + 53 = 199 must hold base_lin_vel * obs_scales.lin_vel
    in the NEWEST critic frame (reference config contract :460-466)."""
    env, step, state, obs, priv, *_ = stepped
    got = np.asarray(priv[:, 199:202], np.float32)
    want = np.asarray(state.phys.base_vel[:, 3:] * 2.0)
    # history is stored in bf16 (see EnvState.obs_hist) — layout must hold
    # to bf16 rounding
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_priv_frame_tail_masks(stepped):
    """last 4 entries of each critic frame are stance_mask(2) + contact_mask(2)."""
    env, step, state, obs, priv, *_ = stepped
    frame = priv[:, -73:]
    tail = np.asarray(frame[:, -4:])
    assert set(np.unique(tail)).issubset({0.0, 1.0})


def test_obs_history_rolls(stepped):
    env, step, state, obs, priv, *_ = stepped
    s2, obs2, *_ = step(state, jnp.zeros((N, 12)))
    # previous newest frame becomes second-newest
    np.testing.assert_allclose(
        np.asarray(obs2[:, -2 * 47:-47]), np.asarray(obs[:, -47:]), atol=1e-6)


def test_reset_zeroes_history(env):
    state = env.init_state(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for i in range(3):
        state, obs, priv, rew, done, _ = step(state, jnp.zeros((N, 12)))
    # force termination: timeout for env 0
    state = state.replace(episode_length=state.episode_length.at[0].set(10_000))
    state, obs, priv, rew, done, _ = step(state, jnp.zeros((N, 12)))
    assert bool(done[0]) and not bool(done[1])
    # env 0: all history frames except the newest are zero (flat [N, 66*47])
    hist0 = np.asarray(state.obs_hist[0], np.float32).reshape(66, 47)
    assert np.all(hist0[:-1] == 0.0)
    assert np.any(hist0[-1] != 0.0)
    # env 1 keeps its history
    hist1 = np.asarray(state.obs_hist[1], np.float32).reshape(66, 47)
    assert np.any(hist1[:-1] != 0.0)
    # episode counters reset (reset happens inside the step, so the
    # freshly-reset env ends the step at 0)
    assert int(state.episode_length[0]) == 0
    assert int(state.episode_length[1]) > 1


def test_termination_on_base_contact(env):
    state = env.init_state(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    state, *_ = step(state, jnp.zeros((N, 12)))
    # lay env 3 on its side just above the ground: it must touch down on the
    # base collision box within a few steps and terminate by base contact
    from ti5_isaacgym_tpu.physics import spatial as sp

    q = sp.quat_from_euler_xyz(jnp.pi / 2, 0.0, 0.0)
    bp = state.phys.base_pos.at[3, 2].set(state.env_origin[3, 2] + 0.26)
    bq = state.phys.base_quat.at[3].set(q)
    bv = state.phys.base_vel.at[3].set(0.0)
    state = state.replace(phys=state.phys.replace(base_pos=bp, base_quat=bq, base_vel=bv))
    fired = False
    for _ in range(30):
        state, obs, priv, rew, done, _ = step(state, jnp.zeros((N, 12)))
        if bool(done[3]):
            fired = True
            break
    assert fired


def test_stand_joint_pos_reward_is_one(env):
    """Standing command ⇒ joint_pos raw reward = 1 when at default pose."""
    state = env.init_state(jax.random.PRNGKey(3))
    state = state.replace(commands=jnp.zeros_like(state.commands))
    step = jax.jit(env.step)
    s1 = state.replace(
        phys=state.phys.replace(
            qpos=jnp.broadcast_to(env.default_dof_pos, (N, 12))))
    s2, obs, priv, rew, done, _ = step(s1, jnp.zeros((N, 12)))
    i = env.reward_names.index("joint_pos")
    per_step = np.asarray(s2.episode_sums[:, i])
    expect = env.reward_scales_dt["joint_pos"] * 1.0
    np.testing.assert_allclose(per_step, expect, rtol=1e-4)


def test_phase_frozen_when_standing(env):
    state = env.init_state(jax.random.PRNGKey(4))
    state = state.replace(commands=jnp.zeros_like(state.commands),
                          gait_time=jnp.full_like(state.gait_time, 10_000))
    step = jax.jit(env.step)
    for _ in range(3):
        state, *_ = step(state, jnp.zeros((N, 12)))
    assert np.all(np.asarray(state.phase_length) == 0)
    phase = env._phase(state, state.phase_length)
    np.testing.assert_allclose(np.asarray(phase), 0.0)


def test_determinism(env):
    def run(seed):
        state = env.init_state(jax.random.PRNGKey(seed))
        step = jax.jit(env.step)
        for i in range(5):
            state, obs, *_ = step(state, jnp.ones((N, 12)) * 0.05)
        return np.asarray(obs)

    o1, o2 = run(7), run(7)
    np.testing.assert_array_equal(o1, o2)


def test_episode_sums_accumulate(stepped):
    env, step, state, *_ = stepped
    s2, *_ = step(state, jnp.zeros((N, 12)))
    s3, *_ = step(s2, jnp.zeros((N, 12)))
    # positive-reward terms keep growing
    i = env.reward_names.index("orientation")
    assert np.all(np.asarray(s3.episode_sums[:, i]) >= np.asarray(s2.episode_sums[:, i]))


def test_domain_randomization_varies(env):
    state = env.init_state(jax.random.PRNGKey(5))
    p = state.params
    assert float(jnp.std(p.friction)) > 0.01
    assert float(jnp.std(p.p_gains)) > 0.1
    assert float(jnp.std(p.dynamics.armature[:, 2])) > 0.05
    assert int(jnp.max(p.lag_steps)) > int(jnp.min(p.lag_steps))
    # base payload randomization: base masses differ across envs
    assert float(jnp.std(p.dynamics.mass[:, 0])) > 0.1
