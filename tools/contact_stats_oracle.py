#!/usr/bin/env python3
"""Contact-statistics comparison: this engine vs the MuJoCo oracle.

VERDICT r4 item 2 asked whether the walk/shuffle basin race is tilted by a
contact-model gap (PhysX TGS in the reference,
``humanoid/envs/base/legged_robot_config.py:309-320``) or is optimizer
stochasticity.  This tool produces the contact-side evidence: it runs the
SAME walking policy through (a) this engine's full env (flat plane, DR off)
and (b) the MuJoCo deployment pipeline (sim2sim harness, nominal model), and
compares the gait's *contact statistics* — support ratio (mean total
vertical GRF / weight), landing peak force, landing impulse, double/single
support and flight fractions, and footfall cadence.  Matching distributions
mean the penalty-contact model presents the optimizer with the same landing
physics MuJoCo's complementarity solver does; the basin race is then an
optimization-path property, not a contact artifact.

  TI5_PLATFORM=cpu JAX_PLATFORMS=cpu python tools/contact_stats_oracle.py \
      [--steps 800] [--cmd 0.4 0 0] [--out eval_round5/contact_stats.json]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

CONTACT_N = 5.0          # a foot is "in contact" above this vertical force
LAND_WIN = 8             # landing window: 80 ms at 100 Hz


def gait_stats(grf, dt, weight, settle=200):
    """grf: [T, n_envs, 2] vertical foot forces at 100 Hz -> stats dict."""
    g = np.asarray(grf, float)[settle:]
    T, N, _ = g.shape
    contact = g > CONTACT_N
    ncon = contact.sum(-1)                     # [T, N] 0/1/2 feet down
    stats = {
        "support_ratio": float(g.sum(-1).mean() / weight),
        "double_support_frac": float((ncon == 2).mean()),
        "single_support_frac": float((ncon == 1).mean()),
        "flight_frac": float((ncon == 0).mean()),
    }
    onsets = contact[1:] & ~contact[:-1]       # [T-1, N, 2]
    peaks, impulses, rate = [], [], []
    for env in range(N):
        for foot in range(2):
            idx = np.flatnonzero(onsets[:, env, foot]) + 1
            rate.append(len(idx) / (T * dt))
            for t0 in idx:
                w = g[t0:t0 + LAND_WIN, env, foot]
                if len(w):
                    peaks.append(w.max())
                    impulses.append(w.sum() * dt)
    stats["footfalls_per_s"] = float(np.mean(rate))
    stats["landing_peak_N"] = float(np.mean(peaks)) if peaks else 0.0
    stats["landing_peak_p95_N"] = float(np.percentile(peaks, 95)) if peaks else 0.0
    stats["landing_impulse_Ns"] = float(np.mean(impulses)) if impulses else 0.0
    return stats


def run_engine(env_cfg, params, cmd, steps, n_envs=4):
    import jax
    import jax.numpy as jnp

    from ti5_isaacgym_tpu.algo.runner import build_network
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv

    cfg = dataclasses.replace(
        env_cfg,
        env=dataclasses.replace(env_cfg.env, num_envs=n_envs),
        terrain=dataclasses.replace(env_cfg.terrain, mesh_type="plane",
                                    curriculum=False),
        domain_rand=dataclasses.replace(
            env_cfg.domain_rand, randomize_friction=False,
            randomize_base_mass=False, randomize_com=False,
            randomize_link_mass=False, randomize_gains=False,
            randomize_torque=False, randomize_motor_offset=False,
            randomize_joint_armature=False, randomize_coulomb_friction=False,
            add_lag=False, add_dof_lag=False, add_imu_lag=False,
            push_robots=False, add_ext_force=False),
        noise=dataclasses.replace(env_cfg.noise, add_noise=False))
    env = T1DHStandEnv(cfg, seed=11)
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1TrainCfg

    net = build_network(T1TrainCfg(), cfg)

    @jax.jit
    def policy(obs):
        return net.apply(params, obs, method="act_mean")

    key = jax.random.PRNGKey(11)
    state, obs, priv = jax.jit(lambda k: env.reset(env.init_state(k)))(key)
    step = jax.jit(env.step)
    fixed = jnp.asarray(cmd, jnp.float32)
    feet = list(env.model.feet_bodies)
    grf, vx = [], []
    for _ in range(steps):
        cmds = state.commands.at[:, :3].set(fixed)
        state = state.replace(commands=cmds,
                              gait_time=jnp.full_like(state.gait_time, 1 << 30))
        state, obs, priv, rew, done, ex = step(state, policy(obs))
        grf.append(np.asarray(state.contact_forces[:, feet, 2]))
        vx.append(np.asarray(state.phys.base_vel[:, 3]))
    weight = float(sum(b["mass"] for b in env.spec["bodies"]) * 9.81) \
        if hasattr(env, "spec") else 55.746 * 9.81
    return np.stack(grf), float(np.mean(vx[len(vx) // 2:])), weight, env.dt


def run_mujoco(env_cfg, params, cmd, steps):
    import mujoco

    import jax
    import jax.numpy as jnp

    from ti5_isaacgym_tpu.algo.runner import build_network
    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1TrainCfg
    from ti5_isaacgym_tpu.scripts.sim2sim import build_model, quat_to_euler_wxyz

    net = build_network(T1TrainCfg(), env_cfg)

    @jax.jit
    def policy(obs):
        return net.apply(params, obs, method="act_inference")

    m = build_model(env_cfg)
    d = mujoco.MjData(m)
    c = env_cfg
    default_q = np.asarray(c.init_state.default_joint_angles)
    kp = np.asarray(c.control.stiffness, float)
    kd = np.asarray(c.control.damping, float)
    effort = np.array([102, 102, 267, 267, 80, 40, 102, 102, 267, 267, 80, 40.2])
    tlim = effort * c.safety.torque_limit
    d.qpos[:3] = [0, 0, 1.0]
    d.qpos[3:7] = [1, 0, 0, 0]
    d.qpos[7:] = default_q
    feet = [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, n)
            for n in ("leg_l6_link", "leg_r6_link")]
    os_ = c.normalization.obs_scales
    cmd = np.asarray(cmd, float)
    cmd_scale = np.array([os_.lin_vel, os_.lin_vel, os_.ang_vel])
    hist = np.zeros((c.env.frame_stack, c.env.num_single_obs), np.float32)
    actions = np.zeros(12, np.float32)
    dec = c.control.decimation
    dt_pol = dec * c.sim.dt
    grf, vx = [], []
    for step_i in range(steps):
        phase = (step_i * dt_pol / c.rewards.cycle_time) % 1.0
        eul = quat_to_euler_wxyz(d.qpos[3:7])
        frame = np.concatenate([
            [np.sin(2 * np.pi * phase), np.cos(2 * np.pi * phase)],
            cmd * cmd_scale,
            (d.qpos[7:] - default_q) * os_.dof_pos,
            d.qvel[6:] * os_.dof_vel, actions,
            d.qvel[3:6] * os_.ang_vel, eul * os_.quat,
        ]).astype(np.float32)
        hist = np.concatenate([hist[1:], frame[None]], axis=0)
        act_mean, _ = jax.device_get(policy(jnp.asarray(hist.reshape(1, -1))))
        actions = np.clip(np.asarray(act_mean)[0], -c.normalization.clip_actions,
                          c.normalization.clip_actions)
        target = actions * c.control.action_scale + default_q
        for _ in range(dec):
            d.ctrl[:] = np.clip(kp * (target - d.qpos[7:]) - kd * d.qvel[6:],
                                -tlim, tlim)
            mujoco.mj_step(m, d)
        # cfrc_ext: contact+external wrench per body, world orientation —
        # rows [torque(3), force(3)]; vertical GRF = force z.  It is only
        # filled by mj_rnePostConstraint (sensors normally trigger it).
        mujoco.mj_rnePostConstraint(m, d)
        grf.append(np.array([[max(d.cfrc_ext[b][5], 0.0) for b in feet]]))
        R = np.zeros(9)
        mujoco.mju_quat2Mat(R, d.qpos[3:7])
        vx.append((R.reshape(3, 3).T @ d.qvel[:3])[0])
        if d.qpos[2] < 0.4:
            raise SystemExit("policy fell in MuJoCo — pick a walking checkpoint")
    weight = float(m.body_mass.sum() * 9.81)
    return np.stack(grf), float(np.mean(vx[len(vx) // 2:])), weight, dt_pol


def run_matched_drop(env_cfg, steps=300, z0=1.0):
    """Open-loop matched-state landing: BOTH engines start from the identical
    state (default pose, base at z0, zero velocity) under zero actions (PD
    holds the default pose), so the first landing is the contact model's
    response at a genuinely matched pre-impact state — the closed-loop gait
    statistics above can differ simply because the policy adapts to each
    engine; this cannot."""
    import mujoco

    import jax
    import jax.numpy as jnp

    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv
    from ti5_isaacgym_tpu.scripts.sim2sim import build_model

    cfg = dataclasses.replace(
        env_cfg,
        env=dataclasses.replace(env_cfg.env, num_envs=4),
        terrain=dataclasses.replace(env_cfg.terrain, mesh_type="plane",
                                    curriculum=False),
        domain_rand=dataclasses.replace(
            env_cfg.domain_rand, randomize_friction=False,
            randomize_base_mass=False, randomize_com=False,
            randomize_link_mass=False, randomize_gains=False,
            randomize_torque=False, randomize_motor_offset=False,
            randomize_joint_armature=False, randomize_coulomb_friction=False,
            add_lag=False, add_dof_lag=False, add_imu_lag=False,
            push_robots=False, add_ext_force=False),
        noise=dataclasses.replace(env_cfg.noise, add_noise=False))
    env = T1DHStandEnv(cfg, seed=0)
    key = jax.random.PRNGKey(0)
    state, obs, priv = jax.jit(lambda k: env.reset(env.init_state(k)))(key)
    n = cfg.env.num_envs
    default_q = jnp.asarray(cfg.init_state.default_joint_angles)
    ph = state.phys
    ph = ph.replace(
        base_pos=jnp.tile(jnp.asarray([0.0, 0.0, z0]), (n, 1)),
        base_quat=jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (n, 1)),
        base_vel=jnp.zeros((n, 6)),
        qpos=jnp.tile(default_q, (n, 1)), qvel=jnp.zeros((n, 12)))
    state = state.replace(phys=ph)
    step = jax.jit(env.step)
    zero = jnp.zeros((n, env.num_actions))
    feet = list(env.model.feet_bodies)
    g_e, z_e = [], []
    for _ in range(steps):
        state, _obs, _priv, _rew, done, _ex = step(state, zero)
        if bool(done[0]):
            break          # termination auto-resets env 0 to spawn — stop
        g_e.append(np.asarray(state.contact_forces[0, feet, 2]))
        z_e.append(float(state.phys.base_pos[0, 2]))

    m = build_model(env_cfg)
    d = mujoco.MjData(m)
    c = env_cfg
    dq = np.asarray(c.init_state.default_joint_angles)
    kp = np.asarray(c.control.stiffness, float)
    kd = np.asarray(c.control.damping, float)
    effort = np.array([102, 102, 267, 267, 80, 40, 102, 102, 267, 267, 80, 40.2])
    tlim = effort * c.safety.torque_limit
    d.qpos[:3] = [0, 0, z0]
    d.qpos[3:7] = [1, 0, 0, 0]
    d.qpos[7:] = dq
    fb = [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, nm)
          for nm in ("leg_l6_link", "leg_r6_link")]
    g_m, z_m = [], []
    for _ in range(steps):
        for _ in range(c.control.decimation):
            d.ctrl[:] = np.clip(kp * (dq - d.qpos[7:]) - kd * d.qvel[6:],
                                -tlim, tlim)
            mujoco.mj_step(m, d)
        mujoco.mj_rnePostConstraint(m, d)
        g_m.append(np.array([max(d.cfrc_ext[b][5], 0.0) for b in fb]))
        z_m.append(float(d.qpos[2]))

    def drop_stats(g, z, dt):
        g = np.asarray(g)         # [T', 2] — truncated at engine-side reset
        z = np.asarray(z)
        tot = g.sum(-1)
        t_c = int(np.argmax(tot > CONTACT_N))
        win = tot[t_c:t_c + 20]   # 200 ms after first contact
        post = tot[t_c + 30:t_c + 80]   # 0.3-0.8 s after contact (pre-topple)
        fallen = np.flatnonzero(z < 0.4)
        return {
            "first_contact_s": t_c * dt,
            "landing_peak_N": float(win.max()) if len(win) else 0.0,
            "landing_impulse_Ns": float(win.sum() * dt),
            "post_landing_grf_N": float(post.mean()) if len(post) else 0.0,
            "topple_s": float(fallen[0] * dt) if len(fallen) else len(z) * dt,
        }

    dt = cfg.control.decimation * cfg.sim.dt
    return drop_stats(g_e, z_e, dt), drop_stats(g_m, z_m, dt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--cmd", type=float, nargs=3, default=[0.4, 0.0, 0.0])
    ap.add_argument("--log_root", default=os.path.join(ROOT, "checkpoints"))
    ap.add_argument("--load_run", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip_policy", action="store_true",
                    help="only the matched-state open-loop drop")
    args = ap.parse_args()

    os.environ.setdefault("TI5_PLATFORM", "cpu")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from ti5_isaacgym_tpu.export.policy import restore_policy_params
    from ti5_isaacgym_tpu.utils.registry import resolve_load_path, task_registry

    env_cfg, train_cfg = task_registry.get_cfgs("t1_dh_stand")
    root = os.path.join(args.log_root, train_cfg.runner.experiment_name)
    path = resolve_load_path(root, args.load_run or -1, -1)
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {root}")
    print(f"policy: {path}")
    params, it = restore_policy_params(path)

    print("running engine rollout...", flush=True)
    g_e, vx_e, w_e, dt = run_engine(env_cfg, params, args.cmd, args.steps)
    print("running MuJoCo rollout...", flush=True)
    g_m, vx_m, w_m, _ = run_mujoco(env_cfg, params, args.cmd, args.steps)

    s_e = gait_stats(g_e, dt, w_e)
    s_m = gait_stats(g_m, dt, w_m)
    print(f"\n{'stat':24s} {'engine':>10s} {'mujoco':>10s}   ratio")
    rows = {}
    for k in s_e:
        r = s_e[k] / s_m[k] if s_m[k] else float("inf")
        rows[k] = {"engine": s_e[k], "mujoco": s_m[k], "ratio": r}
        print(f"{k:24s} {s_e[k]:10.3f} {s_m[k]:10.3f}   {r:5.2f}")
    print(f"{'mean vx (cmd %.2f)' % args.cmd[0]:24s} {vx_e:10.3f} {vx_m:10.3f}")
    if args.out:
        payload = {"checkpoint": path, "iteration": it, "steps": args.steps,
                   "cmd": args.cmd, "stats": rows,
                   "mean_vx": {"engine": vx_e, "mujoco": vx_m}}
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        json.dump(payload, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
