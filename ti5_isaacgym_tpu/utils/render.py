"""Offscreen MuJoCo rendering of evaluation trajectories.

TPU-native equivalent of the reference's viewer/video path: the reference
records mp4s from the Isaac Gym camera during ``play`` (reference
``scripts/play.py:147-207``).  Headless TPU hosts have no sim viewer, so the
eval trajectory (base pose + joint positions per policy step) is replayed
through the spec-generated MJCF purely for visualization and encoded to mp4.
"""
from __future__ import annotations

import os

import numpy as np


def render_trajectory(qpos_traj: np.ndarray, dt: float, out_path: str,
                      spec_path: str | None = None, width: int = 640,
                      height: int = 480, fps: int | None = None,
                      camera_distance: float = 3.0) -> str:
    """Render a [T, 19] trajectory (base pos 3, base quat wxyz 4, 12 joint
    angles — the layout written by ``scripts.play --export_traj``) to mp4.

    Returns the written path.  Requires ``mujoco`` and ``cv2``.
    """
    # headless software GL (no GPU on TPU hosts); must be set before the
    # first mujoco import creates a GL context
    os.environ.setdefault("MUJOCO_GL", "egl")
    os.environ.setdefault("EGL_PLATFORM", "surfaceless")
    os.environ.setdefault("LIBGL_ALWAYS_SOFTWARE", "1")
    import cv2
    import mujoco

    from ..export.mjcf import spec_file_to_mjcf

    if spec_path is None:
        spec_path = os.path.join(os.path.dirname(__file__), "..", "resources",
                                 "t1_model.json")
    model = mujoco.MjModel.from_xml_string(spec_file_to_mjcf(spec_path))
    data = mujoco.MjData(model)

    fps = fps or max(int(round(1.0 / dt)), 1)
    # subsample to <= 50 fps so the file stays small and encoders are happy
    stride = max(int(round(fps / 50.0)), 1)
    out_fps = fps / stride

    qpos_traj = np.asarray(qpos_traj, np.float64)
    assert qpos_traj.ndim == 2 and qpos_traj.shape[1] == model.nq, \
        f"trajectory is {qpos_traj.shape}, model expects nq={model.nq}"

    renderer = mujoco.Renderer(model, height=height, width=width)
    cam = mujoco.MjvCamera()
    mujoco.mjv_defaultFreeCamera(model, cam)
    cam.distance = camera_distance
    cam.elevation = -15.0

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             out_fps, (width, height))
    try:
        for t in range(0, qpos_traj.shape[0], stride):
            data.qpos[:] = qpos_traj[t]
            mujoco.mj_forward(model, data)
            cam.lookat[:] = data.qpos[:3]
            renderer.update_scene(data, camera=cam)
            # renderer yields RGB; VideoWriter wants BGR
            writer.write(cv2.cvtColor(renderer.render(), cv2.COLOR_RGB2BGR))
    finally:
        writer.release()
        renderer.close()
    return out_path
