"""Height-scan (measure_heights) surface tests (VERDICT r2 missing #4).

The 187-point scan is off for t1 but part of the reference surface
(``legged_robot.py:1535-1587``, privileged frame +187/frame per
``t1_dh_stand_env.py:466-468``).  These tests exercise it end-to-end:
config wiring widens the privileged frame, and the yaw-rotated scan agrees
with an independent numpy min-of-3-texels oracle on rough terrain.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg
from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv


def _scan_cfg(num_envs=4):
    cfg = T1EnvCfg()
    return dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=num_envs),
        terrain=dataclasses.replace(
            cfg.terrain, measure_heights=True, num_rows=2, num_cols=2,
            border_size=2.0, curriculum=False),
    )


def test_cfg_wires_height_points_into_priv_obs():
    cfg = _scan_cfg()
    assert cfg.terrain.num_height_points == 17 * 11 == 187
    assert cfg.env.num_height_points == 187
    assert cfg.env.priv_frame_dim == cfg.env.single_num_privileged_obs + 187
    assert cfg.env.num_privileged_obs == cfg.env.c_frame_stack * (
        cfg.env.single_num_privileged_obs + 187)
    # replace() must re-run the wiring (off again when scan is disabled)
    off = dataclasses.replace(
        cfg, terrain=dataclasses.replace(cfg.terrain, measure_heights=False))
    assert off.env.num_height_points == 0
    assert off.env.num_privileged_obs == off.env.c_frame_stack * \
        off.env.single_num_privileged_obs


def _numpy_min3(height, hscale, offset, xy):
    """Independent oracle for the reference's min-of-3-texels lookup
    (legged_robot.py:1575-1583)."""
    rows, cols = height.shape
    u = (xy[..., 0] + offset) / hscale
    v = (xy[..., 1] + offset) / hscale
    i0 = np.clip(u.astype(np.int32), 0, rows - 2)
    j0 = np.clip(v.astype(np.int32), 0, cols - 2)
    return np.minimum(np.minimum(height[i0, j0], height[i0 + 1, j0]),
                      height[i0, j0 + 1])


def _yaw_rot(quat_wxyz, v):
    w, x, y, z = quat_wxyz
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return v @ R.T


def test_measured_heights_match_heightfield_oracle():
    env = T1DHStandEnv(_scan_cfg())
    state = env.init_state(jax.random.PRNGKey(0))

    # place the robots at known spots with known yaws on the rough terrain.
    # Positions/yaws are deliberately GENERIC (no multiples of the 0.1 m
    # texel pitch, no axis-aligned yaws): scan points exactly on a texel
    # boundary round to different cells in the env's f32 math vs the
    # oracle's f64 and the test would compare different texels.
    pos = np.array([[9.037, 9.541, 1.0], [10.473, 9.622, 1.0],
                    [9.318, 11.244, 1.0], [12.041, 12.733, 1.0]], np.float32)
    yaws = np.array([0.0, 1.492, -0.731, 2.113], np.float32)
    quat = np.stack([np.cos(yaws / 2), np.zeros_like(yaws),
                     np.zeros_like(yaws), np.sin(yaws / 2)], -1)
    state = state.replace(phys=state.phys.replace(
        base_pos=jnp.asarray(pos), base_quat=jnp.asarray(quat)))

    got = np.asarray(env.measured_heights(state))
    assert got.shape == (4, 187)

    height = np.asarray(state.terrain_height)
    grid = np.asarray(env.height_points)                       # [187, 3]
    for e in range(4):
        world = _yaw_rot(quat[e], grid) + pos[e]
        want = _numpy_min3(height, env.heightfield.hscale,
                           env.heightfield.offset, world[:, :2])
        np.testing.assert_allclose(got[e], want, atol=1e-5)

    # rough terrain: the scan must actually see relief somewhere
    assert np.ptp(got) > 0.0


@pytest.mark.slow
def test_reset_emits_widened_privileged_obs():
    env = T1DHStandEnv(_scan_cfg())
    cfg = env.cfg
    assert env.priv_frame_dim == cfg.env.single_num_privileged_obs + 187
    state, obs, priv = jax.jit(
        lambda k: env.reset(env.init_state(k)))(jax.random.PRNGKey(1))
    assert priv.shape == (4, cfg.env.num_privileged_obs)
    assert obs.shape == (4, cfg.env.num_observations)
    assert bool(jnp.all(jnp.isfinite(priv.astype(jnp.float32))))
    # the height block of the newest frame is bounded by the clip in
    # _compute_observations (reference t1_dh_stand_env.py:466-468)
    newest = priv[:, -env.priv_frame_dim:]
    h = np.asarray(newest[:, cfg.env.single_num_privileged_obs:], np.float32)
    scale = cfg.normalization.obs_scales.height_measurements
    assert np.all(np.abs(h) <= scale + 1e-5)
