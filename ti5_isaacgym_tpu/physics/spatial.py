"""Spatial algebra + rotation utilities for the TPU-native rigid-body engine.

Conventions
-----------
* Quaternions are ``(w, x, y, z)`` (scalar first).  The reference stack uses
  Isaac Gym's ``(x, y, z, w)`` ordering (see reference
  ``humanoid/envs/t1/t1_dh_stand_env.py:16-39``); we convert at the API
  boundary where parity matters (euler extraction below reproduces the exact
  wrap-to-[-pi, pi] behaviour of the reference's ``get_euler_xyz_tensor``).
* Spatial (6D) vectors are ordered ``[angular(3), linear(3)]`` (Featherstone).
* All functions are pure jnp, shape-polymorphic over leading batch dims where
  noted, and safe under ``jit``/``vmap``.
"""
from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Small-matrix algebra on the VPU
#
# TPU note: batched tiny matmuls (3x3, 6x6 with a [num_envs] batch dim) lower
# to MXU dot_generals that pad each matrix to the 128x128 systolic tile —
# enormous waste — and run at bf16 input precision by default, which is not
# acceptable for dynamics.  Expressing them as broadcast-multiply-reduce keeps
# them on the VPU, exact in f32, and perfectly vectorized over the env batch.
# All engine code must use `mm`/`mv` instead of `@`/`einsum` for these.
# ---------------------------------------------------------------------------


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., m, k) @ (..., k, n) for small static k — VPU-only, exact f32."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def mv(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., m, k) @ (..., k) for small static k — VPU-only, exact f32."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def mtv(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., k, m)^T @ (..., k) — transpose matvec without materializing a^T."""
    return jnp.sum(a * v[..., :, None], axis=-2)


def transpose(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(a, -1, -2)


def cho_solve_psd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for a small symmetric positive-definite A (..., n, n)
    via an unrolled Cholesky — VPU-only, exact f32 (replaces
    ``jnp.linalg.solve``'s LU path which pads onto the MXU)."""
    n = A.shape[-1]
    # Cholesky factorization, unrolled (n is a small static constant)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity() -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both (...,4) wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v (...,3) by quaternion q (...,4): R(q) @ v."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2*w*(u x v) + 2*(u x (u x v))
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q: R(q)^T @ v."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) wxyz -> (...,3,3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> (...,4) wxyz.  Branch-free Shepperd via max-trace trick."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions (unnormalised)
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4cand,4)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """axis (...,3) unit, angle (...) -> quat (...,4)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate([jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Integrate orientation by world-frame angular velocity over dt.

    Uses the exponential map (exact for constant omega) which keeps the
    quaternion unit-norm far better than the Euler qdot update at 1 kHz.
    """
    ang = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    axis = omega_world / jnp.where(ang > 1e-9, ang, 1.0)
    dq = quat_from_axis_angle(axis, (ang * dt)[..., 0])
    return quat_normalize(quat_mul(dq, q))


def quat_from_euler_xyz(roll, pitch, yaw) -> jnp.ndarray:
    """Intrinsic x-y-z (roll, pitch, yaw) -> quaternion wxyz."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_to_euler_xyz(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (wxyz) -> euler (roll, pitch, yaw) each wrapped to (-pi, pi].

    Reproduces the reference's ``get_euler_xyz_tensor`` semantics
    (reference t1_dh_stand_env.py:16-39): RPY extracted from the rotation,
    then values > pi get 2*pi subtracted.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = w * w - x * x - y * y + z * z
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = w * w + x * x - y * y - z * z
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    e = jnp.stack([roll, pitch, yaw], axis=-1)
    # mod to [0, 2pi) then wrap >pi down — same as the reference chain
    e = jnp.mod(e, 2.0 * jnp.pi)
    return jnp.where(e > jnp.pi, e - 2.0 * jnp.pi, e)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q (reference utils/math.py)."""
    yaw = quat_to_euler_xyz(q)[..., 2]
    zero = jnp.zeros_like(yaw)
    qy = quat_from_euler_xyz(zero, zero, yaw)
    return quat_rotate(qy, v)


def wrap_to_pi(a: jnp.ndarray) -> jnp.ndarray:
    a = jnp.mod(a + jnp.pi, 2.0 * jnp.pi)
    return jnp.where(a < 0, a + 2.0 * jnp.pi, a) - jnp.pi


# ---------------------------------------------------------------------------
# SO(3) helpers
# ---------------------------------------------------------------------------


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def rpy_to_mat(rpy: jnp.ndarray) -> jnp.ndarray:
    """URDF rpy (fixed-axis XYZ) -> rotation matrix.  R = Rz(y) Ry(p) Rx(r)."""
    return quat_to_mat(quat_from_euler_xyz(rpy[..., 0], rpy[..., 1], rpy[..., 2]))


# ---------------------------------------------------------------------------
# Spatial (Plücker) algebra — 6D vectors [angular, linear]
# ---------------------------------------------------------------------------


def xform(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Build spatial motion transform X (6,6) from rotation R (B->A is v_B = X v_A
    with R rotating A coords into B) and translation p (origin of B expressed in A).

    X = [[R^T? ...]] — we follow Featherstone: for frames where B is located at
    p in A with orientation E (A->B rotation), motion vectors transform as
    ``v_B = X_BA v_A`` with::

        X = [[E, 0], [-E @ skew(p), E]]
    """
    E = R
    top = jnp.concatenate([E, jnp.zeros_like(E)], axis=-1)
    bot = jnp.concatenate([-mm(E, skew(p)), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def xform_inv(X: jnp.ndarray) -> jnp.ndarray:
    """Invert a spatial motion transform built by ``xform``."""
    E = X[..., :3, :3]
    mEskp = X[..., 3:, :3]
    Et = jnp.swapaxes(E, -1, -2)
    top = jnp.concatenate([Et, jnp.zeros_like(E)], axis=-1)
    bot = jnp.concatenate([mm(mm(Et, mEskp), E), Et], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crm(v: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross-product matrix [v x] for v=(...,6)."""
    w, u = v[..., :3], v[..., 3:]
    sw, su = skew(w), skew(u)
    top = jnp.concatenate([sw, jnp.zeros_like(sw)], axis=-1)
    bot = jnp.concatenate([su, sw], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crf(v: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross-product matrix [v x*] = -[v x]^T."""
    return -jnp.swapaxes(crm(v), -1, -2)


def spatial_inertia(mass: jnp.ndarray, com: jnp.ndarray, I_com: jnp.ndarray) -> jnp.ndarray:
    """Build the 6x6 spatial inertia of a body about its frame origin.

    mass (...,), com (...,3) offset of CoM from body origin, I_com (...,3,3)
    rotational inertia about the CoM.
    """
    c = skew(com)
    m = mass[..., None, None]
    I_o = I_com + m * mm(c, jnp.swapaxes(c, -1, -2))
    top = jnp.concatenate([I_o, m * c], axis=-1)
    bot = jnp.concatenate([m * jnp.swapaxes(c, -1, -2), m * jnp.eye(3, dtype=I_com.dtype) * jnp.ones_like(m)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
