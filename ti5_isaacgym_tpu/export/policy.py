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


def export_controller_yaml(env_cfg, out_dir: str, name: str = "policy_config") -> str:
    """Robot-side controller parameters (reference ``extract_config.py``
    KEY_MAPPING surface: gains, scales, limits, obs layout)."""
    import yaml

    os.makedirs(out_dir, exist_ok=True)
    c = env_cfg
    data = {
        "num_single_obs": c.env.num_single_obs,
        "frame_stack": c.env.frame_stack,
        "short_frame_stack": c.env.short_frame_stack,
        "num_actions": c.env.num_actions,
        "num_commands": c.env.num_commands,
        "cycle_time": c.rewards.cycle_time,
        "action_scale": c.control.action_scale,
        "decimation": c.control.decimation,
        "sim_dt": c.sim.dt,
        "stiffness": list(c.control.stiffness),
        "damping": list(c.control.damping),
        "default_joint_angles": list(c.init_state.default_joint_angles),
        "clip_observations": c.normalization.clip_observations,
        "clip_actions": c.normalization.clip_actions,
        "obs_scales": {
            "lin_vel": c.normalization.obs_scales.lin_vel,
            "ang_vel": c.normalization.obs_scales.ang_vel,
            "dof_pos": c.normalization.obs_scales.dof_pos,
            "dof_vel": c.normalization.obs_scales.dof_vel,
            "quat": c.normalization.obs_scales.quat,
        },
        "torque_limit": c.safety.torque_limit,
        "stand_com_threshold": c.commands.stand_com_threshold,
    }
    path = os.path.join(out_dir, f"{name}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)
    return path
