"""K1 task configuration — the framework's second robot asset.

K1 (``resources/k1/k1.urdf`` -> ``ti5_isaacgym_tpu/resources/k1_model.json``)
is a taller, lighter-limbed 12-DoF biped with the same joint topology as the
T1, so it shares the task env class; everything robot-specific (pose, gains,
limits, reward geometry) comes from this config.  This proves the asset
pipeline + registry generalize beyond the reference's single robot
(reference surface: ``task_registry.register`` of additional tasks,
``humanoid/utils/task_registry.py:16``).
"""
from __future__ import annotations

import dataclasses

from .t1_dh_stand import (AssetSection, ControlSection, InitStateSection,
                          RewardsSection, T1EnvCfg, T1TrainCfg)

_INIT = 0.25   # bent-knee default pose (rad)


def k1_env_cfg() -> T1EnvCfg:
    base = T1EnvCfg()
    return dataclasses.replace(
        base,
        asset=dataclasses.replace(
            base.asset, name="k1", model_spec="k1_model.json"),
        init_state=dataclasses.replace(
            base.init_state,
            pos=(0.0, 0.0, 1.12),
            default_joint_angles=(
                0.0, 0.0, -_INIT, 2 * _INIT, -_INIT, 0.0,
                0.0, 0.0, -_INIT, 2 * _INIT, -_INIT, 0.0,
            )),
        control=dataclasses.replace(
            base.control,
            stiffness=(60, 90, 140, 160, 50, 30, 60, 90, 140, 160, 50, 30),
            damping=(5, 7, 11, 13, 4, 2.5, 5, 7, 11, 13, 4, 2.5)),
        rewards=dataclasses.replace(
            base.rewards,
            base_height_target=1.045,
            foot_min_dist=0.17, foot_max_dist=0.50,
            knee_min_dist=0.14, knee_max_dist=0.40),
    )


def k1_train_cfg() -> T1TrainCfg:
    base = T1TrainCfg()
    return dataclasses.replace(
        base, runner=dataclasses.replace(base.runner,
                                         experiment_name="k1_dh_stand"))
