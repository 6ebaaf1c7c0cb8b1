"""Export a trained policy for deployment (reference ``scripts/export_policy_dh.py``).

    python -m ti5_isaacgym_tpu.scripts.export_policy --task t1_dh_stand \\
        [--load_run -1] [--checkpoint -1] [--out exported]
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser("ti5 export")
    p.add_argument("--task", type=str, default="t1_dh_stand")
    p.add_argument("--load_run", type=str, default=None)
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--log_root", type=str, default=None)
    p.add_argument("--out", type=str, default="exported")
    p.add_argument("--random_policy", action="store_true")
    args = p.parse_args(argv)

    import dataclasses

    from ..utils.jax_setup import setup_jax

    setup_jax()  # honors TI5_PLATFORM=cpu (don't claim the TPU for an export)
    import jax

    from ..algo.runner import build_network
    from ..export.policy import export_controller_yaml, export_npz, export_stablehlo
    from ..utils.registry import LEGGED_GYM_ROOT, resolve_load_path, task_registry

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    network = build_network(train_cfg, env_cfg)
    import jax.numpy as jnp

    obs = jnp.zeros((1, env_cfg.env.num_observations))
    priv = jnp.zeros((1, env_cfg.env.num_privileged_obs))
    params = network.init(jax.random.PRNGKey(0), obs, priv)
    if not args.random_policy:
        from ..export.policy import restore_policy_params

        root = args.log_root or os.path.join(LEGGED_GYM_ROOT, "logs",
                                             train_cfg.runner.experiment_name)
        path = resolve_load_path(root, args.load_run or -1, args.checkpoint or -1)
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {root}")
        print(f"loading {path}")
        # params-only untemplated restore: works on runner full-carry saves
        # and slim checkpoints alike (the old StandardCheckpointer template
        # restore crashed on every runner-saved checkpoint)
        params, it = restore_policy_params(path)
        print(f"checkpoint iteration {it}")

    print("wrote", export_npz(network, params, args.out))
    print("wrote", export_stablehlo(network, params, args.out))
    print("wrote", export_controller_yaml(env_cfg, args.out))
    if train_cfg.runner.policy_class_name == "ActorCriticDH":
        from ..export.onnx import export_onnx_dh

        onnx_path = os.path.join(args.out, "ti5_dh_policy.onnx")
        print("wrote", export_onnx_dh(jax.device_get(params), onnx_path))


if __name__ == "__main__":
    main()
