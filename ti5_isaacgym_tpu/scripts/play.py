"""Policy evaluation / deployment preview (reference ``humanoid/scripts/play.py``).

Runs a trained policy in a small eval-configured env batch, logs the
reference's diagnostic state panels + per-episode reward decomposition, and
can export the state trajectory for MuJoCo visualization or sim2sim checks.

    python -m ti5_isaacgym_tpu.scripts.play --task t1_dh_stand \\
        [--load_run -1] [--checkpoint -1] [--steps 1000] [--fix_command]
"""
from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def get_play_args(argv=None):
    p = argparse.ArgumentParser("ti5 play")
    p.add_argument("--task", type=str, default="t1_dh_stand")
    p.add_argument("--num_envs", type=int, default=9)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--load_run", type=str, default=None)
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--log_root", type=str, default=None)
    p.add_argument("--fix_command", action="store_true",
                   help="drive a fixed forward command instead of the schedule")
    p.add_argument("--command", type=float, nargs=3, default=[0.4, 0.0, 0.0])
    p.add_argument("--export_traj", type=str, default=None,
                   help="write the robot-0 qpos trajectory to this .npz")
    p.add_argument("--video", type=str, default=None,
                   help="render the robot-0 trajectory to this .mp4 "
                        "(offscreen MuJoCo replay; reference play.py records "
                        "mp4 from the sim camera, :147-207)")
    p.add_argument("--out_dir", type=str, default="eval_out")
    p.add_argument("--random_policy", action="store_true",
                   help="skip checkpoint loading (smoke-testing)")
    p.add_argument("--teleop", type=str, default="off",
                   choices=["off", "auto", "joystick", "keyboard"],
                   help="drive commands interactively (reference play.py "
                        "joystick thread :44-62 / viewer keyboard events)")
    p.add_argument("--live", action="store_true",
                   help="live MuJoCo viewer replaying robot 0 (needs a "
                        "display; reference base_task.py viewer :89-156)")
    return p.parse_args(argv)


def play(args):
    import jax

    from ..utils.jax_setup import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from ..utils.logger import Logger
    from ..utils.registry import LEGGED_GYM_ROOT, resolve_load_path, task_registry

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    # eval-time overrides (reference play.py:66-110): few envs, no pushes,
    # no external forces, keep lag + noise for realism
    env_cfg = dataclasses.replace(
        env_cfg,
        env=dataclasses.replace(env_cfg.env, num_envs=args.num_envs,
                                episode_length_s=1000.0),
        terrain=dataclasses.replace(env_cfg.terrain, num_rows=3, num_cols=3,
                                    curriculum=False, border_size=5.0),
        domain_rand=dataclasses.replace(env_cfg.domain_rand, push_robots=False,
                                        add_ext_force=False),
    )
    env_class = task_registry._get(args.task)[0]
    env = env_class(env_cfg, seed=train_cfg.seed)

    from ..algo.runner import OnPolicyRunner

    runner = OnPolicyRunner(env, env_cfg, train_cfg, log_dir=None)
    carry = runner.init_carry()
    if not args.random_policy:
        root = args.log_root or os.path.join(LEGGED_GYM_ROOT, "logs",
                                             train_cfg.runner.experiment_name)
        path = resolve_load_path(root, args.load_run or -1, args.checkpoint or -1)
        if path is None:
            raise FileNotFoundError(f"no checkpoint found under {root}")
        print(f"loading {path}")
        carry = runner.load(path, carry, params_only=True)
    policy = runner.get_inference_policy(carry.ts.params)

    logger = Logger(env.dt)
    state, obs, priv = jax.jit(env.reset)(carry.env_state)
    step = jax.jit(env.step)
    fixed_cmd = jnp.asarray(args.command, jnp.float32)

    teleop = None
    if args.teleop != "off":
        from ..utils.teleop import make_teleop

        teleop = make_teleop(args.teleop)
        if teleop is None:
            print("[play] no teleop source available; using the schedule")

    viewer = None
    if args.live:
        # live viewing replays robot 0 into a MuJoCo passive viewer (the
        # reference's create_viewer/draw_viewer path needs Isaac Gym's GUI)
        try:
            import mujoco
            import mujoco.viewer

            from ..export.mjcf import spec_file_to_mjcf

            spec = os.path.join(os.path.dirname(__file__), "..", "resources",
                                "t1_model.json")
            mj_model = mujoco.MjModel.from_xml_string(spec_file_to_mjcf(spec))
            mj_data = mujoco.MjData(mj_model)
            import json as _json

            spec_body_names = [b["name"] for b in
                               _json.load(open(spec))["bodies"]]
            viewer = mujoco.viewer.launch_passive(mj_model, mj_data)
        except Exception as e:
            print(f"[play] live viewer unavailable: {e}")
            viewer = None

    traj = []
    for i in range(args.steps):
        if teleop is not None and teleop.ok:
            if teleop.exited:
                break
            cmds = state.commands.at[:, :3].set(jnp.asarray(teleop.get()))
            state = state.replace(commands=cmds,
                                  gait_time=jnp.full_like(state.gait_time, 1 << 30))
        elif args.fix_command:
            cmds = state.commands.at[:, :3].set(fixed_cmd)
            state = state.replace(commands=cmds,
                                  gait_time=jnp.full_like(state.gait_time, 1 << 30))
        actions = policy(obs)
        state, obs, priv, rew, done, extras = step(state, actions)
        robot = 0
        logger.log_states({
            "base_vel_x": state.phys.base_vel[robot, 3],
            "base_vel_y": state.phys.base_vel[robot, 4],
            "base_vel_z": state.phys.base_vel[robot, 5],
            "base_vel_yaw": state.phys.base_vel[robot, 2],
            "command_x": state.commands[robot, 0],
            "command_y": state.commands[robot, 1],
            "command_yaw": state.commands[robot, 2],
            "base_height": state.phys.base_pos[robot, 2],
            "contact_forces_z_l": state.contact_forces[robot, env.model.feet_bodies[0], 2],
            "contact_forces_z_r": state.contact_forces[robot, env.model.feet_bodies[1], 2],
            "dof_pos": state.phys.qpos[robot, 3],
            "dof_pos_target": state.actions[robot, 3] * env.cfg.control.action_scale
            + env.default_dof_pos[3],
            "dof_vel": state.phys.qvel[robot, 3],
            "dof_torque": state.torques[robot, 3],
        })
        n_done = float(extras["done_count"])
        if n_done:
            sums = np.asarray(extras["episode_sums_done"])
            logger.log_rewards(
                {f"rew_{n}": s / max(n_done, 1) for n, s in zip(env.reward_names, sums)},
                int(n_done))
        if args.export_traj or args.video:
            traj.append(np.concatenate([
                np.asarray(state.phys.base_pos[robot]),
                np.asarray(state.phys.base_quat[robot]),
                np.asarray(state.phys.qpos[robot])]))
        if viewer is not None:
            if not viewer.is_running():
                break
            mj_data.qpos[:3] = np.asarray(state.phys.base_pos[robot])
            mj_data.qpos[3:7] = np.asarray(state.phys.base_quat[robot])
            mj_data.qpos[7:] = np.asarray(state.phys.qpos[robot])
            import mujoco as _mj

            _mj.mj_forward(mj_model, mj_data)
            try:
                # debug-viz parity (reference legged_robot.py:1521-1533):
                # height-scan spheres + contact-force arrows from the
                # ENGINE state, anchored at the replayed MuJoCo kinematics
                from ..utils.debug_viz import update_overlay

                update_overlay(viewer, mj_model, mj_data, env, state,
                               robot=robot, spec_body_names=spec_body_names)
            except Exception:
                pass  # overlay is best-effort; never kill the replay
            viewer.sync()
        if i % 200 == 0:
            print(f"step {i}: base z {float(state.phys.base_pos[robot, 2]):.3f} "
                  f"vx {float(state.phys.base_vel[robot, 3]):+.2f} "
                  f"(cmd {float(state.commands[robot, 0]):+.2f})", flush=True)

    if teleop is not None:
        teleop.stop()
    if viewer is not None:
        viewer.close()
    logger.print_rewards()
    logger.plot_states(args.out_dir)
    if args.export_traj:
        np.savez(args.export_traj, qpos=np.stack(traj), dt=env.dt)
        print(f"wrote {args.export_traj}")
    if args.video:
        from ..utils.render import render_trajectory

        render_trajectory(np.stack(traj), env.dt, args.video)
        print(f"wrote {args.video}")


def main(argv=None):
    play(get_play_args(argv))


if __name__ == "__main__":
    main()
