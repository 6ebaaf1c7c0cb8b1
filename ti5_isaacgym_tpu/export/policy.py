"""Policy export for deployment (reference export pipeline C21-C24:
``scripts/export_policy_dh.py`` -> ``export_onnx_dh.py`` -> ``export_mnn_t1.py``).

TPU-native equivalents:

* :func:`export_npz` — flat numpy weight archive + architecture manifest;
  the input format for the C++ deployment runtime (``native/``) that plays
  the MNN role on-robot.
* :func:`export_stablehlo` — serialized `jax.export` artifact of the
  deterministic inference function (portable XLA deployment path).
* :func:`export_controller_yaml` — the robot-side controller YAML the
  reference generates by AST-walking its config snapshot
  (``scripts/extract_config.py``); here it reads the live dataclass config.

The exported forward contract matches the reference's ``ExportedDH`` wrapper
(``export_policy_dh.py:14-36``): stacked 3102-dim obs in -> (12 action means,
3 estimated base velocities) out.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def restore_policy_params(path: str):
    """Restore only the policy-relevant leaves of a runner checkpoint.

    Runner checkpoints (``algo/runner.py:save``) hold the full training carry
    (params / opt_state / lr / iteration / env_state / rng); slim checkpoints
    (``tools/slim_checkpoint.py``) hold a subset with the same key names.
    Deployment-side consumers (export, sim2sim) only need ``params``, so we
    restore WITHOUT a pytree template — an untemplated numpy restore works for
    any checkpoint flavor, any training num_envs, and any source device
    topology (the reference analogously loads only ``model_state_dict``,
    ``dh_on_policy_runner.py:311-322``).

    Returns ``(params, iteration)``.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    src = os.path.abspath(path)
    meta = ckptr.metadata(src).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    raw = ckptr.restore(src, restore_args=restore_args)
    if "params" not in raw:
        raise KeyError(f"checkpoint {path} has no 'params' subtree "
                       f"(keys: {sorted(raw)})")
    iteration = int(np.asarray(raw.get("iteration", -1)))
    return raw["params"], iteration


def _flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(_flatten_params(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(params)
    return out


def export_npz(network, params, out_dir: str, name: str = "policy_dh") -> str:
    """Weights + manifest; consumed by the native inference runtime."""
    os.makedirs(out_dir, exist_ok=True)
    flat = _flatten_params(params["params"])
    path = os.path.join(out_dir, f"{name}.npz")
    np.savez(path, **flat)
    manifest = {
        "format": "ti5-npz-v1",
        "network": type(network).__name__,
        "inputs": {"obs": [66 * 47]},
        "outputs": {"action_mean": [12], "est_lin_vel": [3]},
        "tensors": {k: list(v.shape) for k, v in flat.items()},
    }
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return path


def export_stablehlo(network, params, out_dir: str, name: str = "policy_dh",
                     batch: int = 1) -> str:
    """Serialize the inference function with `jax.export` (StableHLO)."""
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)

    def infer(obs):
        return network.apply(params, obs, method="act_inference")

    obs_spec = jax.ShapeDtypeStruct((batch, 66 * 47), jnp.float32)
    # multi-platform artifact: deployable on CPU hosts and TPU servers alike
    exported = jexport.export(jax.jit(infer), platforms=("cpu", "tpu"))(obs_spec)
    path = os.path.join(out_dir, f"{name}.stablehlo")
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_stablehlo(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def export_controller_yaml(env_cfg, out_dir: str, name: str = "policy_config",
                           dof_names=None) -> str:
    """Robot-side controller parameters in the reference controller's exact
    YAML schema (``scripts/extract_config.py:6-56``): the ``LeggedRobotCfg``
    tree with per-joint gain/angle dicts (the KEY_MAPPING expansion to
    ``leg_{l,r}N_joint`` names), ``clip_scales``/``obs_scales``, ``size``,
    and the controller-side ``mode``/``filter`` sections.  A controller
    written against the reference's file consumes this one unchanged."""
    import yaml

    os.makedirs(out_dir, exist_ok=True)
    c = env_cfg
    if dof_names is None:
        # T1 joint order used by the config tuples (reference KEY_MAPPING)
        dof_names = tuple(f"leg_{s}{i}_joint" for s in ("l", "r")
                          for i in range(1, 7))
    per_joint = lambda vals: {n: float(v) for n, v in zip(dof_names, vals)}
    os_ = c.normalization.obs_scales
    policy_rate = 1.0 / (c.sim.dt * c.control.decimation)
    data = {
        "LeggedRobotCfg": {
            "init_state": {
                "default_joint_angle": per_joint(c.init_state.default_joint_angles),
            },
            "control": {
                "stiffness": per_joint(c.control.stiffness),
                "damping": per_joint(c.control.damping),
                "action_scale": c.control.action_scale,
                "decimation": c.control.decimation,
                "cycle_time": c.rewards.cycle_time,
            },
            "normalization": {
                "clip_scales": {
                    "clip_observations": c.normalization.clip_observations,
                    "clip_actions": c.normalization.clip_actions,
                },
                "obs_scales": {
                    "lin_vel": os_.lin_vel, "ang_vel": os_.ang_vel,
                    "dof_pos": os_.dof_pos, "dof_vel": os_.dof_vel,
                    "quat": os_.quat,
                    "height_measurements": getattr(os_, "height_measurements", 5.0),
                },
            },
            "size": {
                "actions_size": c.env.num_actions,
                "observations_size": c.env.num_single_obs,
                "num_hist": c.env.frame_stack,
            },
            # controller-side run modes/filters (constants in the reference
            # extractor, extract_config.py:43-53); cmd_threshold and
            # sample_rate derive from the trained config
            "mode": {
                "sw_mode": bool(c.commands.sw_switch),
                "cmd_threshold": c.commands.stand_com_threshold,
                "ang_vel_threshold": 100000,
                "angle_threshold": 0.1,
            },
            "filter": {
                "filt_action": True,
                "sample_rate": int(round(policy_rate)),
                "cutoff_freq": 3.0,
            },
        },
        # deployment extras beyond the reference schema (additive keys only)
        "extras": {
            "short_frame_stack": c.env.short_frame_stack,
            "num_commands": c.env.num_commands,
            "sim_dt": c.sim.dt,
            "torque_limit": c.safety.torque_limit,
        },
    }
    path = os.path.join(out_dir, f"{name}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)
    return path
