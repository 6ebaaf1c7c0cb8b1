"""Sim-to-sim policy transfer check in MuJoCo (recreates the reference's
missing ``scripts/sim2sim.py`` — its README documents MuJoCo transfer as the
integration gate, reference ``README.md:31-36``).

Loads a policy (checkpoint or exported .npz/stablehlo), rebuilds the
deployment-side observation pipeline (47-dim frame with sin/cos phase,
commands, lagless joint states, IMU; stacked 66 deep), and runs the robot in
MuJoCo on the spec-generated MJCF with the same 1 kHz PD / 100 Hz policy
timing.  Reports tracking error and survival time.

    python -m ti5_isaacgym_tpu.scripts.sim2sim --steps 500 --random_policy
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def quat_to_euler_wxyz(q):
    w, x, y, z = q
    roll = np.arctan2(2 * (w * x + y * z), w * w - x * x - y * y + z * z)
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    yaw = np.arctan2(2 * (w * z + x * y), w * w + x * x - y * y - z * z)
    e = np.array([roll, pitch, yaw])
    e = np.mod(e, 2 * np.pi)
    return np.where(e > np.pi, e - 2 * np.pi, e)


def main(argv=None):
    p = argparse.ArgumentParser("ti5 sim2sim")
    p.add_argument("--task", type=str, default="t1_dh_stand")
    p.add_argument("--steps", type=int, default=1000, help="policy steps (100 Hz)")
    p.add_argument("--command", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    p.add_argument("--load_run", type=str, default=None)
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--log_root", type=str, default=None)
    p.add_argument("--random_policy", action="store_true")
    args = p.parse_args(argv)

    import mujoco

    import jax

    from ..utils.jax_setup import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from ..algo.runner import build_network
    from ..export.mjcf import spec_to_mjcf
    from ..utils.registry import LEGGED_GYM_ROOT, resolve_load_path, task_registry

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    network = build_network(train_cfg, env_cfg)
    obs0 = jnp.zeros((1, env_cfg.env.num_observations))
    priv0 = jnp.zeros((1, env_cfg.env.num_privileged_obs))
    params = network.init(jax.random.PRNGKey(0), obs0, priv0)
    if not args.random_policy:
        from ..export.policy import restore_policy_params

        root = args.log_root or os.path.join(LEGGED_GYM_ROOT, "logs",
                                             train_cfg.runner.experiment_name)
        path = resolve_load_path(root, args.load_run or -1, args.checkpoint or -1)
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {root}")
        print(f"loading {path}")
        # params-only untemplated restore (works on full and slim checkpoints)
        params, it = restore_policy_params(path)
        print(f"checkpoint iteration {it}")

    @jax.jit
    def policy(obs):
        return network.apply(params, obs, method="act_inference")

    # --- MuJoCo world from the shipped model spec ---
    spec_path = os.path.join(os.path.dirname(__file__), "..", "resources", "t1_model.json")
    spec = json.load(open(spec_path))
    m = mujoco.MjModel.from_xml_string(spec_to_mjcf(spec, with_geoms=True, limited=True))
    # mid-range armature like training
    m.dof_armature[6:] = [(a + b) / 2 for a, b in env_cfg.domain_rand.joint_armature_ranges]
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

    os_ = c.normalization.obs_scales
    cmd = np.asarray(args.command)
    cmd_scale = np.array([os_.lin_vel, os_.lin_vel, os_.ang_vel])
    hist = np.zeros((c.env.frame_stack, c.env.num_single_obs), np.float32)
    actions = np.zeros(12, np.float32)
    dec = c.control.decimation
    dt_pol = dec * c.sim.dt
    stand = np.linalg.norm(cmd) <= c.commands.stand_com_threshold
    vx_err_acc, n_acc, t_alive = 0.0, 0, 0
    for step in range(args.steps):
        # 47-dim deployment observation frame
        phase = 0.0 if stand else (step * dt_pol / c.rewards.cycle_time) % 1.0
        q = d.qpos[7:] - default_q
        dq = d.qvel[6:]
        quat = d.qpos[3:7]
        ang_vel = d.qvel[3:6]  # free-joint angular velocity is body-frame
        eul = quat_to_euler_wxyz(quat)
        frame = np.concatenate([
            [np.sin(2 * np.pi * phase), np.cos(2 * np.pi * phase)],
            cmd * cmd_scale,
            q * os_.dof_pos, dq * os_.dof_vel, actions,
            ang_vel * os_.ang_vel, eul * os_.quat,
        ]).astype(np.float32)
        hist = np.concatenate([hist[1:], frame[None]], axis=0)
        obs = jnp.asarray(hist.reshape(1, -1))
        act_mean, est_vel = jax.device_get(policy(obs))
        actions = np.clip(np.asarray(act_mean)[0], -c.normalization.clip_actions,
                          c.normalization.clip_actions)
        target = actions * c.control.action_scale + default_q
        for _ in range(dec):
            tau = np.clip(kp * (target - d.qpos[7:]) - kd * d.qvel[6:], -tlim, tlim)
            d.ctrl[:] = tau
            mujoco.mj_step(m, d)
        # base-frame vx
        R = np.zeros(9)
        mujoco.mju_quat2Mat(R, d.qpos[3:7])
        vx_body = (R.reshape(3, 3).T @ d.qvel[:3])[0]
        vx_err_acc += abs(vx_body - cmd[0])
        n_acc += 1
        t_alive = step
        if d.qpos[2] < 0.4:
            print(f"fell at t={step * dt_pol:.2f}s")
            break
    print(f"sim2sim: survived {t_alive * dt_pol:.2f}s / "
          f"{args.steps * dt_pol:.2f}s, mean |vx err| = {vx_err_acc / max(n_acc, 1):.3f} m/s, "
          f"final z = {d.qpos[2]:.3f}")
    return 0


if __name__ == "__main__":
    main()
