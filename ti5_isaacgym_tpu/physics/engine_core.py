"""Scalarized (component-form) physics substep — the TPU hot loop.

This is the production path of the engine: the entire 1 kHz substep
(FK -> contact -> joint limits -> ABA -> semi-implicit Euler) expressed over
per-component ``[num_envs]`` arrays (see :mod:`spatial3` for why: TPU tiles
the trailing dims, so ``[N]``-shaped elementwise chains are the only layout
that fills the vector lanes).  Model geometry (joint frames, axes, collision
points) enters as trace-time Python constants, so XLA constant-folds the
kinematic structure into the fused loops.

The reference implementation with array-of-structures layout lives in
:mod:`engine` / :mod:`dynamics` and doubles as the oracle: the equivalence
test asserts both paths produce the same trajectories.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import spatial3 as s3
from .contact import ContactOpts, HeightField
from .engine import PhysicsState, SolverOpts
from .model import RobotModel


def _const_v3(arr) -> tuple:
    a = np.asarray(arr, dtype=np.float32)
    return (float(a[0]), float(a[1]), float(a[2]))


def _const_m33(arr) -> tuple:
    a = np.asarray(arr, dtype=np.float32)
    return tuple(tuple(float(a[i, j]) for j in range(3)) for i in range(3))


class ModelConsts(NamedTuple):
    """Trace-time constants of the kinematic tree (python lists of floats —
    folded into the compiled program by XLA / Mosaic)."""

    nb: int
    nd: int
    ncp: int
    parent: list
    axis_c: list
    jpos_c: list
    jrot_c: list
    jrot_identity: list
    cp_body: list
    cp_pos_c: list
    dof_lower: list
    dof_upper: list
    dof_effort: list


def model_consts(model: RobotModel) -> ModelConsts:
    nb = model.nb
    ncp = int(model.cp_pos.shape[0])
    return ModelConsts(
        nb=nb, nd=model.num_dof, ncp=ncp,
        parent=[int(p) for p in np.asarray(model.parent)],
        axis_c=[_const_v3(np.asarray(model.joint_axis)[i]) for i in range(nb)],
        jpos_c=[_const_v3(np.asarray(model.joint_pos)[i]) for i in range(nb)],
        jrot_c=[_const_m33(np.asarray(model.joint_rot)[i]) for i in range(nb)],
        jrot_identity=[bool(np.allclose(np.asarray(model.joint_rot)[i], np.eye(3)))
                       for i in range(nb)],
        cp_body=[int(b) for b in np.asarray(model.cp_body)],
        cp_pos_c=[_const_v3(np.asarray(model.cp_pos)[k]) for k in range(ncp)],
        dof_lower=[float(x) for x in np.asarray(model.dof_lower)],
        dof_upper=[float(x) for x in np.asarray(model.dof_upper)],
        dof_effort=[float(x) for x in np.asarray(model.dof_effort)],
    )


def substep_batched(
    model: RobotModel,
    params,                      # DynamicsParams with leading [N]
    terrain: HeightField,
    copts: ContactOpts,
    sopts: SolverOpts,
    state: PhysicsState,         # leading [N]
    tau: jnp.ndarray,            # [N, 12]
    friction: jnp.ndarray,       # [N]
    cp_meff: jnp.ndarray,        # [ncp, 2]
    base_force_w: Optional[jnp.ndarray] = None,   # [N, 3]
    base_torque_w: Optional[jnp.ndarray] = None,  # [N, 3]
    cell_cache=None,                               # ContactCells frozen per policy step
    restitution: Optional[jnp.ndarray] = None,     # [N] per-env restitution
    _ablate: str = "",                             # dev-only perf bisection
) -> Tuple[PhysicsState, jnp.ndarray]:
    nb = model.nb
    nd = model.num_dof

    # --- unpack state into components, delegate to the stacked core
    # (model geometry enters as trace-time constants, folded by XLA) ---
    mc = model_consts(model)
    comps = dict(
        bp=s3.v3_unstack(state.base_pos),
        bq=s3.q_unstack(state.base_quat),
        bw=s3.v3_unstack(state.base_vel[..., :3]),
        bv=s3.v3_unstack(state.base_vel[..., 3:]),
        qpos=[state.qpos[..., j] for j in range(nd)],
        qvel=[state.qvel[..., j] for j in range(nd)],
        tau=[tau[..., j] for j in range(nd)],
        mass=[params.mass[..., i] for i in range(nb)],
        com=[s3.v3_unstack(params.com[..., i, :]) for i in range(nb)],
        inert=[s3.m33_unstack(params.inertia[..., i, :, :]) for i in range(nb)],
        arma=[params.armature[..., j] for j in range(nd)],
        friction=friction,
        ax=jnp.moveaxis(state.cp_anchor[..., 0], -1, 0),   # [ncp, N]
        ay=jnp.moveaxis(state.cp_anchor[..., 1], -1, 0),
        az=jnp.moveaxis(state.cp_anchor[..., 2], -1, 0),
        bf=s3.v3_unstack(base_force_w) if base_force_w is not None else None,
        bt=s3.v3_unstack(base_torque_w) if base_torque_w is not None else None,
    )
    if restitution is not None:
        comps["restitution"] = restitution

    sample_fn = None
    if cell_cache is None and _ablate != "flat_analytic":
        def sample_fn(xs, ys):
            u = (xs + terrain.offset) / terrain.hscale
            vv = (ys + terrain.offset) / terrain.hscale
            rows, cols = terrain.height.shape
            i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, rows - 2)
            j0 = jnp.clip(jnp.floor(vv).astype(jnp.int32), 0, cols - 2)
            fu = jnp.clip(u - i0, 0.0, 1.0)
            fv = jnp.clip(vv - j0, 0.0, 1.0)
            h00 = terrain.height[i0, j0]
            h10 = terrain.height[i0 + 1, j0]
            h01 = terrain.height[i0, j0 + 1]
            h11 = terrain.height[i0 + 1, j0 + 1]
            return (h00 * (1 - fu) * (1 - fv) + h10 * fu * (1 - fv)
                    + h01 * (1 - fu) * fv + h11 * fu * fv)

    out = substep_stacked(mc, terrain.hscale, copts, sopts, comps,
                          cells=cell_cache, cp_meff=np.asarray(cp_meff),
                          sample_fn=sample_fn, _ablate=_ablate)

    # --- repack ---
    if _ablate == "no_contact":
        new_anchor = state.cp_anchor
    else:
        new_anchor = jnp.stack([
            jnp.moveaxis(out["nax"], 0, -1), jnp.moveaxis(out["nay"], 0, -1),
            jnp.moveaxis(out["naz"], 0, -1)], axis=-1)       # [N, ncp, 3]
    new_state = PhysicsState(
        base_pos=s3.v3_stack(out["bp"]),
        base_quat=s3.q_stack(out["bq"]),
        base_vel=jnp.concatenate(
            [s3.v3_stack(out["bw"]), s3.v3_stack(out["bv"])], axis=-1),
        qpos=jnp.stack(out["qpos"], axis=-1),
        qvel=jnp.stack(out["qvel"], axis=-1),
        cp_anchor=new_anchor,
    )
    body_forces = jnp.stack(
        [s3.v3_stack(f) for f in out["f_body"]], axis=-2)    # [N, nb, 3]
    return new_state, body_forces


def fk_components(mc: ModelConsts, bp, bq, bw, bv, qpos, qvel):
    """Component-form forward kinematics over the tree.

    Inputs are V3/quat tuples (base) and length-nd lists (joints) of
    arbitrarily-batched arrays; returns (pos, rot, w, v, R_pc) lists indexed
    by body — world position, world rotation (M33 tuple), body-frame angular
    and linear velocity, and the parent→child joint rotation.  Pure
    elementwise math: safe inside a Pallas kernel.
    """
    nb = mc.nb
    parent, axis_c, jpos_c = mc.parent, mc.axis_c, mc.jpos_c
    jrot_c, jrot_identity = mc.jrot_c, mc.jrot_identity
    pos = [bp]
    rot = [s3.q_to_m33(bq)]
    w = [bw]
    v = [bv]
    R_pc = [None] * nb
    for i in range(1, nb):
        p = parent[i]
        j = i - 1
        qj = s3.q_from_axis_angle(axis_c[i], qpos[j])
        Rj = s3.q_to_m33(qj)
        Rpc = Rj if jrot_identity[i] else s3.m33_mm(jrot_c[i], Rj)
        R_pc[i] = Rpc
        rot.append(s3.m33_mm(rot[p], Rpc))
        pos.append(s3.v3_add(pos[p], s3.m33_mv(rot[p], jpos_c[i])))
        w.append(s3.v3_add(s3.m33_tmv(Rpc, w[p]), s3.v3_scale(axis_c[i], qvel[j])))
        v.append(s3.m33_tmv(Rpc, s3.v3_add(v[p], s3.v3_cross(w[p], jpos_c[i]))))
    return pos, rot, w, v, R_pc


def ctx_row_layout(nf: int, nk: int) -> dict:
    """Row offsets of the ctx kinematics block for ``nf`` feet and ``nk``
    knee bodies — the SINGLE definition of the producer/consumer contract
    between :func:`ctx_stack_rows`, the megakernel's ctx output, and the
    env's ``_make_ctx`` (a hand-mirrored layout would silently corrupt
    feet rewards if either side reordered)."""
    return {
        "pos": 0,                       # 3 rows per foot (xyz)
        "rot": 3 * nf,                  # 5 rows per foot (R00,R10,R20,R21,R22)
        "angvel": 8 * nf,               # 2 rows per foot (wx, wy)
        "knee": 10 * nf,                # 2 rows per knee (xy)
        "total": 10 * nf + 2 * nk,
    }


def ctx_stack_rows(mc: ModelConsts, feet: list, knees: list,
                   bp, bq, bw, bv, qpos, qvel):
    """Post-step reward/termination kinematics as a flat row list
    (``ctx_row_layout(len(feet), len(knees))["total"]`` rows; 24 for T1):

      0:6   feet world position      (foot0 xyz | foot1 xyz)
      6:16  feet rotation entries    (R00,R10,R20,R21,R22 per foot — exactly
            what the RPY extraction needs; atan2/asin run OUTSIDE the kernel
            on the emitted rows, Mosaic has no atan2)
      16:20 feet world angular vel   (wx,wy per foot — foot_slip reward)
      20:24 knee world xy            (knee-distance reward)

    Shared by the Pallas megakernel (emitted as an extra output once per
    policy step) and usable from any component-form caller.
    """
    pos, rot, w, _, _ = fk_components(mc, bp, bq, bw, bv, qpos, qvel)
    rows = []
    for b in feet:
        rows += [pos[b][0], pos[b][1], pos[b][2]]
    for b in feet:
        R = rot[b]
        rows += [R[0][0], R[1][0], R[2][0], R[2][1], R[2][2]]
    for b in feet:
        ww = s3.m33_mv(rot[b], w[b])
        rows += [ww[0], ww[1]]
    for b in knees:
        rows += [pos[b][0], pos[b][1]]
    return rows


def substep_stacked(mc: ModelConsts, hscale: float, copts: ContactOpts,
                    sopts: SolverOpts, comps: dict, cells=None, cp_meff=None,
                    sample_fn=None, _ablate: str = "") -> dict:
    """The substep math over pure components — shared by the XLA path
    (:func:`substep_batched`) and the Pallas megakernel
    (:mod:`ti5_isaacgym_tpu.physics.megakernel`).

    Everything is elementwise over the batch dims of the component arrays:
    V3/M33 tuples for the tree quantities, ``[ncp, ...B]`` stacked arrays for
    the contact points.  No reshapes, transposes, or gathers — safe to trace
    inside a Pallas kernel where only tile-aligned ops are cheap.

    comps keys: bp/bq/bw/bv (tuples), qpos/qvel/tau/arma (length-nd lists),
    mass (length-nb list), com (list of V3), inert (list of M33), friction,
    ax/ay/az ([ncp, ...B]), bf/bt (V3 or None).
    cells: CellCache with [ncp, ...B] fields (frozen-cell path), or None with
    ``sample_fn`` for the direct bilinear-gather path.
    Returns dict: bp/bq/bw/bv, qpos/qvel, nax/nay/naz, f_body (list of V3).
    """
    nb, nd, ncp = mc.nb, mc.nd, mc.ncp
    parent, axis_c, jpos_c = mc.parent, mc.axis_c, mc.jpos_c
    jrot_c, jrot_identity = mc.jrot_c, mc.jrot_identity
    cp_body, cp_pos_c = mc.cp_body, mc.cp_pos_c
    dof_lower, dof_upper, dof_effort = mc.dof_lower, mc.dof_upper, mc.dof_effort

    bp, bq, bw, bv = comps["bp"], comps["bq"], comps["bw"], comps["bv"]
    qpos, qvel, tauj = comps["qpos"], comps["qvel"], comps["tau"]
    mass, com, inert, arma = comps["mass"], comps["com"], comps["inert"], comps["arma"]
    friction = comps["friction"]
    ax_, ay_, az_ = comps["ax"], comps["ay"], comps["az"]
    bf, bt = comps.get("bf"), comps.get("bt")

    # --- FK (component form) ---
    pos, rot, w, v, R_pc = fk_components(mc, bp, bq, bw, bv, qpos, qvel)

    # --- contact: all points' world kinematics ---
    pw = []   # list of V3
    vw = []
    for k in range(ncp):
        b = cp_body[k]
        pl = cp_pos_c[k]
        pw.append(s3.v3_add(pos[b], s3.m33_mv(rot[b], pl)))
        vloc = s3.v3_add(v[b], s3.v3_cross(w[b], pl))
        vw.append(s3.m33_mv(rot[b], vloc))

    px = jnp.stack([p[0] for p in pw])    # [ncp, ...B]
    py = jnp.stack([p[1] for p in pw])
    pz = jnp.stack([p[2] for p in pw])

    if _ablate == "flat_analytic":
        h = jnp.zeros_like(px)
        dhdx = jnp.zeros_like(px)
        dhdy = jnp.zeros_like(px)
    elif cells is not None:
        # frozen-cell analytic bilinear (see contact.CellCache): height and
        # gradient from per-point corners gathered once per policy step —
        # zero gathers inside the 1 kHz loop.  fu/fv are NOT clipped, so the
        # surface extrapolates continuously if a point drifts off its cell.
        fu = (px - cells.x0) / hscale
        fv = (py - cells.y0) / hscale
        c00, c10 = cells.h00, cells.h10
        c01, c11 = cells.h01, cells.h11
        gu = 1.0 - fu
        gv = 1.0 - fv
        h = c00 * gu * gv + c10 * fu * gv + c01 * gu * fv + c11 * fu * fv
        dhdx = ((c10 - c00) * gv + (c11 - c01) * fv) / hscale
        dhdy = ((c01 - c00) * gu + (c11 - c10) * fu) / hscale
    else:
        h = sample_fn(px, py)
        eps = hscale * 0.5
        dhdx = (sample_fn(px + eps, py) - sample_fn(px - eps, py)) / (2 * eps)
        dhdy = (sample_fn(px, py + eps) - sample_fn(px, py - eps)) / (2 * eps)
    n_norm = jnp.sqrt(dhdx * dhdx + dhdy * dhdy + 1.0)
    nx, ny, nz = -dhdx / n_norm, -dhdy / n_norm, 1.0 / n_norm

    gap = h - pz
    depth = jnp.clip(gap * nz, 0.0, copts.max_depth)
    active = gap > 0.0

    # per-point contact force (implicit-rate normal + anchor-spring
    # friction), vectorized over points with [ncp, ...B] component arrays
    # (points ride the sublanes, envs the lanes)
    vx = jnp.stack([vv[0] for vv in vw])
    vy = jnp.stack([vv[1] for vv in vw])
    vz = jnp.stack([vv[2] for vv in vw])
    if "mn" in comps:          # megakernel path: passed as kernel inputs
        mn, mt = comps["mn"], comps["mt"]
    else:
        mn = jnp.asarray(np.asarray(cp_meff)[:, 0])[(...,) + (None,) * (px.ndim - 1)]
        mt = jnp.asarray(np.asarray(cp_meff)[:, 1])[(...,) + (None,) * (px.ndim - 1)]
    # per-env restitution e in [0, 1): scales down the normal contact damping
    # (kd_eff = kd * (1 - e)) — in a compliant spring-damper the damping term
    # IS the impact-energy sink, so e=0 keeps the critically-damped (dead)
    # impact and larger e returns more of the impact velocity.  This is the
    # TPU-native equivalent of the per-shape restitution the reference writes
    # into PhysX (legged_robot.py:803-820).
    rest = comps.get("restitution")
    if rest is not None:
        k_v = copts.kp * copts.dt + copts.kd * (1.0 - rest)
    else:
        k_v = copts.kp * copts.dt + copts.kd
    kt_v = copts.kt * copts.dt + copts.kdt
    v_n = nx * vx + ny * vy + nz * vz
    denom = 1.0 + copts.dt * k_v / mn
    f_n = jnp.clip((copts.kp * depth - k_v * v_n) / denom,
                   0.0, copts.max_force) * active
    # depenetration-velocity cap (PhysX maxDepenetrationVelocity, reference
    # t1_dh_stand_config.py:172): stop the approach, but impart at most
    # max_depen_vel of outward velocity — deep-penetration spring energy is
    # dropped, not released as launch (the "trampoline" failure mode)
    f_cap = jnp.maximum(mn * (copts.max_depen_vel - v_n) / copts.dt, 0.0)
    f_n = jnp.minimum(f_n, f_cap)
    vtx, vty, vtz = vx - v_n * nx, vy - v_n * ny, vz - v_n * nz
    dtx, dty, dtz = px - ax_, py - ay_, pz - az_
    d_n = dtx * nx + dty * ny + dtz * nz
    dtx, dty, dtz = dtx - d_n * nx, dty - d_n * ny, dtz - d_n * nz
    denom_t = 1.0 + copts.dt * kt_v / mt
    ftx = -(copts.kt * dtx + kt_v * vtx) / denom_t
    fty = -(copts.kt * dty + kt_v * vty) / denom_t
    ftz = -(copts.kt * dtz + kt_v * vtz) / denom_t
    ft_mag = jnp.sqrt(ftx * ftx + fty * fty + ftz * ftz)
    cone = friction * f_n
    scale = jnp.where(ft_mag > cone, cone / (ft_mag + 1e-8), 1.0) * active
    ftx, fty, ftz = ftx * scale, fty * scale, ftz * scale
    fX = nx * f_n + ftx
    fY = ny * f_n + fty
    fZ = nz * f_n + ftz
    sliding = (ft_mag > cone) & active
    sx = px + ftx * denom_t / copts.kt
    sy = py + fty * denom_t / copts.kt
    sz = pz + ftz * denom_t / copts.kt
    nax = jnp.where(active, jnp.where(sliding, sx, ax_), px)
    nay = jnp.where(active, jnp.where(sliding, sy, ay_), py)
    naz = jnp.where(active, jnp.where(sliding, sz, az_), pz)
    if _ablate in ("no_contact_force", "no_contact"):
        # zero the contact wrench (and for "no_contact" also the anchor
        # update) so XLA dead-code-eliminates the whole contact chain
        zero = jnp.zeros_like(px[0])
        f_pts = [(zero, zero, zero) for _ in range(ncp)]
    else:
        f_pts = [(fX[k], fY[k], fZ[k]) for k in range(ncp)]

    # per-body contact force/torque accumulation (world)
    f_body = [s3.v3_zero_like(bp) for _ in range(nb)]
    t_body = [s3.v3_zero_like(bp) for _ in range(nb)]
    for k in range(ncp):
        b = cp_body[k]
        f_body[b] = s3.v3_add(f_body[b], f_pts[k])
        arm = s3.v3_sub(pw[k], pos[b])
        t_body[b] = s3.v3_add(t_body[b], s3.v3_cross(arm, f_pts[k]))

    # the applied external wrench enters the dynamics but must NOT appear in
    # the reported contact forces (PhysX net-contact-force semantics)
    fx_body = list(f_body)
    tx_body = list(t_body)
    if bf is not None:
        fx_body[0] = s3.v3_add(fx_body[0], bf)
    if bt is not None:
        tx_body[0] = s3.v3_add(tx_body[0], bt)

    # --- joint-limit penalty + effort clamp ---
    tau_t = []
    for j in range(nd):
        over = jnp.maximum(qpos[j] - dof_upper[j], 0.0)
        under = jnp.maximum(dof_lower[j] - qpos[j], 0.0)
        t_lim = -sopts.limit_kp * over + sopts.limit_kp * under
        in_vio = (over > 0) | (under > 0)
        t_lim = t_lim - jnp.where(in_vio, sopts.limit_kd * qvel[j], 0.0)
        tau_t.append(jnp.clip(tauj[j], -dof_effort[j], dof_effort[j]) + t_lim)

    # --- ABA (block/component form; gravity free-fall-relative).
    # The A and D blocks of the articulated inertia are symmetric and carried
    # as 6-tuples; only the B block is a full 3x3. ---
    IA_A, IA_B, IA_D = [None] * nb, [None] * nb, [None] * nb
    for i in range(nb):
        c = com[i]
        cc = s3.v3_dot(c, c)
        # m * (c~ c~^T) = m * ((c.c) I - c c^T), symmetric
        sk = s3.sym_sub(s3.sym_identity_scaled(cc), s3.sym_outer(c))
        IA_A[i] = s3.sym_add(s3.sym_from_m33(inert[i]), s3.sym_scale(sk, mass[i]))
        IA_B[i] = s3.m33_scale(s3.m33_skew(c), mass[i])
        IA_D[i] = s3.sym_identity_scaled(mass[i])

    cb_a, cb_l = [None] * nb, [None] * nb
    pA_a, pA_l = [None] * nb, [None] * nb
    for i in range(nb):
        wi, vi = w[i], v[i]
        if i == 0:
            cb_a[i] = s3.v3_zero_like(wi)
            cb_l[i] = s3.v3_zero_like(wi)
        else:
            sj = s3.v3_scale(axis_c[i], qvel[i - 1])
            cb_a[i] = s3.v3_cross(wi, sj)
            cb_l[i] = s3.v3_cross(vi, sj)
        n_ = s3.v3_add(s3.sym_mv(IA_A[i], wi), s3.m33_mv(IA_B[i], vi))
        f_ = s3.v3_add(s3.m33_tmv(IA_B[i], wi), s3.v3_scale(vi, mass[i]))
        pA_a[i] = s3.v3_add(s3.v3_cross(wi, n_), s3.v3_cross(vi, f_))
        pA_l[i] = s3.v3_cross(wi, f_)
        # external (contact + applied) wrench, world -> body
        pA_a[i] = s3.v3_sub(pA_a[i], s3.m33_tmv(rot[i], tx_body[i]))
        pA_l[i] = s3.v3_sub(pA_l[i], s3.m33_tmv(rot[i], fx_body[i]))

    U_a, U_l, d_, u_ = [None] * nb, [None] * nb, [None] * nb, [None] * nb
    for i in range(nb - 1, 0, -1):
        p = parent[i]
        s = axis_c[i]
        U_a[i] = s3.sym_mv(IA_A[i], s)
        U_l[i] = s3.m33_tmv(IA_B[i], s)
        d_[i] = s3.v3_dot(s, U_a[i]) + arma[i - 1]
        u_[i] = tau_t[i - 1] - s3.v3_dot(s, pA_a[i])
        inv_d = 1.0 / d_[i]
        Ia_A = s3.sym_sub(IA_A[i], s3.sym_outer(U_a[i], inv_d))
        Ia_B = s3.m33_sub(IA_B[i], s3.m33_outer(U_a[i], U_l[i], inv_d))
        Ia_D = s3.sym_sub(IA_D[i], s3.sym_outer(U_l[i], inv_d))
        ud = u_[i] * inv_d
        pa_a = s3.v3_add(
            s3.v3_add(pA_a[i], s3.sym_mv(Ia_A, cb_a[i])),
            s3.v3_add(s3.m33_mv(Ia_B, cb_l[i]), s3.v3_scale(U_a[i], ud)))
        pa_l = s3.v3_add(
            s3.v3_add(pA_l[i], s3.m33_tmv(Ia_B, cb_a[i])),
            s3.v3_add(s3.sym_mv(Ia_D, cb_l[i]), s3.v3_scale(U_l[i], ud)))
        R = R_pc[i]
        pp = jpos_c[i]
        f_par = s3.m33_mv(R, pa_l)
        pA_a[p] = s3.v3_add(pA_a[p],
                            s3.v3_add(s3.m33_mv(R, pa_a), s3.v3_cross(pp, f_par)))
        pA_l[p] = s3.v3_add(pA_l[p], f_par)
        psk = s3.m33_skew(pp)
        RA = s3.sym_congruence(R, Ia_A)                      # R Ia_A R^T (sym)
        RB = s3.m33_mm(R, s3.m33_mmt(Ia_B, R))               # R Ia_B R^T (full)
        RD = s3.sym_congruence(R, Ia_D)                      # R Ia_D R^T (sym)
        # Y_A = RA - (RB p~ + (RB p~)^T) - p~ RD p~ ;  Y_B = RB + p~ RD
        M = s3.m33_mm(RB, psk)
        Y_A = s3.sym_sub(s3.sym_sub(RA, s3.sym2_of(M)),
                         s3.sym_skew_congruence(pp, RD))
        Y_B = s3.m33_add(RB, s3.m33_mm(psk, s3.sym_to_m33(RD)))
        IA_A[p] = s3.sym_add(IA_A[p], Y_A)
        IA_B[p] = s3.m33_add(IA_B[p], Y_B)
        IA_D[p] = s3.sym_add(IA_D[p], RD)

    # base 6x6 SPD solve, scalarized
    A_full = s3.sym_to_m33(IA_A[0])
    D_full = s3.sym_to_m33(IA_D[0])
    A6 = [[None] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            A6[i][j] = A_full[i][j]
            A6[i][3 + j] = IA_B[0][i][j]
            A6[3 + i][j] = IA_B[0][j][i]
            A6[3 + i][3 + j] = D_full[i][j]
    for i in range(6):
        A6[i][i] = A6[i][i] + 1e-9
    rhs = [-pA_a[0][0], -pA_a[0][1], -pA_a[0][2], -pA_l[0][0], -pA_l[0][1], -pA_l[0][2]]
    a0 = s3.chol6_solve(A6, rhs)
    a_a = [None] * nb
    a_l = [None] * nb
    a_a[0] = (a0[0], a0[1], a0[2])
    a_l[0] = (a0[3], a0[4], a0[5])

    qdd = [None] * nd
    for i in range(1, nb):
        p = parent[i]
        R = R_pc[i]
        pp = jpos_c[i]
        ai_a = s3.v3_add(s3.m33_tmv(R, a_a[p]), cb_a[i])
        ai_l = s3.v3_add(
            s3.m33_tmv(R, s3.v3_add(a_l[p], s3.v3_cross(a_a[p], pp))), cb_l[i])
        qdd[i - 1] = (u_[i] - s3.v3_dot(U_a[i], ai_a) - s3.v3_dot(U_l[i], ai_l)) / d_[i]
        a_a[i] = s3.v3_add(ai_a, s3.v3_scale(axis_c[i], qdd[i - 1]))
        a_l[i] = ai_l

    # gravity back in (base only) — uniform field trick
    g_body = s3.m33_tmv(rot[0], (jnp.zeros_like(bp[0]), jnp.zeros_like(bp[0]),
                                 jnp.full_like(bp[0], sopts.gravity)))
    a_base_lin = s3.v3_add(a_l[0], g_body)

    # --- semi-implicit Euler, component form ---
    dt = sopts.dt
    bw_n = s3.v3_add(bw, s3.v3_scale(a_a[0], dt))
    bv_n = s3.v3_add(bv, s3.v3_scale(a_base_lin, dt))
    # PhysX-style rigid-body velocity caps (maxLinearVelocity /
    # maxAngularVelocity): bounds runaway contact/limit interactions so a
    # pathological DR draw can't overflow f32 into NaN mid-rollout
    bw_n = tuple(jnp.clip(c, -sopts.max_qvel, sopts.max_qvel) for c in bw_n)
    bv_n = tuple(jnp.clip(c, -sopts.max_qvel, sopts.max_qvel) for c in bv_n)
    qvel_n = [jnp.clip(qvel[j] + dt * qdd[j], -sopts.max_qvel, sopts.max_qvel)
              for j in range(nd)]
    qpos_n = [qpos[j] + dt * qvel_n[j] for j in range(nd)]
    # hard joint stops: PhysX enforces the URDF position limits as rigid
    # constraints (reference legged_robot.py:849 reads them from the asset and
    # the solver holds them).  The soft penalty above decelerates near the
    # stop; this projection makes the stop inviolable — without it, policies
    # learn to SIT on the penalty springs ~0.2-0.4 rad beyond the limits
    # (energy-free crouch support), a degenerate optimum real hardware and
    # the reference simulator both forbid.
    for j in range(nd):
        hit_up = qpos_n[j] > dof_upper[j]
        hit_lo = qpos_n[j] < dof_lower[j]
        qvel_n[j] = jnp.where(hit_up, jnp.minimum(qvel_n[j], 0.0),
                              jnp.where(hit_lo, jnp.maximum(qvel_n[j], 0.0),
                                        qvel_n[j]))
        qpos_n[j] = jnp.clip(qpos_n[j], dof_lower[j], dof_upper[j])
    ang = s3.v3_norm(bw_n) + 1e-12
    axis = s3.v3_scale(bw_n, 1.0 / ang)
    dq = s3.q_from_axis_angle(axis, ang * dt)
    bq_n = s3.q_normalize(s3.q_mul(bq, dq))
    bp_n = s3.v3_add(bp, s3.v3_scale(s3.q_rotate(bq_n, bv_n), dt))

    return dict(bp=bp_n, bq=bq_n, bw=bw_n, bv=bv_n, qpos=qpos_n, qvel=qvel_n,
                nax=nax, nay=nay, naz=naz, f_body=f_body)


def ctx_kinematics(model: RobotModel, state: PhysicsState):
    """Component-form post-step kinematics for the task layer.

    Computes exactly what the env's reward/termination context needs —
    feet world pose (position + RPY euler) and world angular velocity xy,
    knee world xy, and the base world-frame velocities (the reference's
    ``root_states[:, 7:13]`` / ``rigid_state`` views) — without building
    [N, nb, 3, 3] array-of-structures frames (which cost ~2 ms at 4096 envs
    vs ~0.3 ms in component form on TPU).

    state may carry any leading batch shape ``B``.  Returns a dict:
      feet_pos [B,2,3], feet_euler [B,2,3], feet_angvel_xy [B,2,2],
      knee_xy [B,2,2], root_lin_w [B,3], root_ang_w [B,3].
    """
    nb = model.nb
    nd = model.num_dof
    parent = [int(p) for p in np.asarray(model.parent)]
    axis_c = [_const_v3(np.asarray(model.joint_axis)[i]) for i in range(nb)]
    jpos_c = [_const_v3(np.asarray(model.joint_pos)[i]) for i in range(nb)]
    jrot_c = [_const_m33(np.asarray(model.joint_rot)[i]) for i in range(nb)]
    jrot_identity = [bool(np.allclose(np.asarray(model.joint_rot)[i], np.eye(3)))
                     for i in range(nb)]

    bp = s3.v3_unstack(state.base_pos)
    bq = s3.q_unstack(state.base_quat)
    bw = s3.v3_unstack(state.base_vel[..., :3])
    bv = s3.v3_unstack(state.base_vel[..., 3:])
    qpos = [state.qpos[..., j] for j in range(nd)]
    qvel = [state.qvel[..., j] for j in range(nd)]

    pos = [bp]
    rot = [s3.q_to_m33(bq)]
    w = [bw]
    v = [bv]
    for i in range(1, nb):
        p = parent[i]
        qj = s3.q_from_axis_angle(axis_c[i], qpos[i - 1])
        Rj = s3.q_to_m33(qj)
        Rpc = Rj if jrot_identity[i] else s3.m33_mm(jrot_c[i], Rj)
        rot.append(s3.m33_mm(rot[p], Rpc))
        pos.append(s3.v3_add(pos[p], s3.m33_mv(rot[p], jpos_c[i])))
        w.append(s3.v3_add(s3.m33_tmv(Rpc, w[p]), s3.v3_scale(axis_c[i], qvel[i - 1])))
        v.append(s3.m33_tmv(Rpc, s3.v3_add(v[p], s3.v3_cross(w[p], jpos_c[i]))))

    def euler_xyz(R):
        # RPY from world_from_body R (== quat_to_euler_xyz semantics,
        # reference t1_dh_stand_env.py:16-39; atan2/asin are pre-wrapped)
        roll = jnp.arctan2(R[2][1], R[2][2])
        pitch = jnp.arcsin(jnp.clip(-R[2][0], -1.0, 1.0))
        yaw = jnp.arctan2(R[1][0], R[0][0])
        return roll, pitch, yaw

    feet = list(model.feet_bodies)
    knees = list(model.knee_bodies)
    feet_pos = jnp.stack(
        [jnp.stack(pos[b], axis=-1) for b in feet], axis=-2)        # [B,2,3]
    feet_euler = jnp.stack(
        [jnp.stack(euler_xyz(rot[b]), axis=-1) for b in feet], axis=-2)
    feet_angvel_xy = []
    for b in feet:
        ww = s3.m33_mv(rot[b], w[b])                                # world
        feet_angvel_xy.append(jnp.stack([ww[0], ww[1]], axis=-1))
    feet_angvel_xy = jnp.stack(feet_angvel_xy, axis=-2)             # [B,2,2]
    knee_xy = jnp.stack(
        [jnp.stack([pos[b][0], pos[b][1]], axis=-1) for b in knees], axis=-2)
    root_lin_w = jnp.stack(s3.m33_mv(rot[0], bv), axis=-1)
    root_ang_w = jnp.stack(s3.m33_mv(rot[0], bw), axis=-1)
    return {
        "feet_pos": feet_pos, "feet_euler": feet_euler,
        "feet_angvel_xy": feet_angvel_xy, "knee_xy": knee_xy,
        "root_lin_w": root_lin_w, "root_ang_w": root_ang_w,
    }


def contact_point_xy(model: RobotModel, state: PhysicsState):
    """World xy of every collision point, ([ncp, N], [ncp, N]).

    Positions-only component-form FK, used once per policy step (outside the
    decimation scan) to pick each point's frozen bilinear cell
    (:class:`~ti5_isaacgym_tpu.physics.contact.CellCache`).
    """
    nb = model.nb
    ncp = int(model.cp_pos.shape[0])
    parent = [int(p) for p in np.asarray(model.parent)]
    axis_c = [_const_v3(np.asarray(model.joint_axis)[i]) for i in range(nb)]
    jpos_c = [_const_v3(np.asarray(model.joint_pos)[i]) for i in range(nb)]
    jrot_c = [_const_m33(np.asarray(model.joint_rot)[i]) for i in range(nb)]
    jrot_identity = [bool(np.allclose(np.asarray(model.joint_rot)[i], np.eye(3)))
                     for i in range(nb)]
    cp_body = [int(b) for b in np.asarray(model.cp_body)]
    cp_pos_c = [_const_v3(np.asarray(model.cp_pos)[k]) for k in range(ncp)]

    bp = s3.v3_unstack(state.base_pos)
    bq = s3.q_unstack(state.base_quat)
    qpos = [state.qpos[..., j] for j in range(model.num_dof)]

    pos = [bp]
    rot = [s3.q_to_m33(bq)]
    for i in range(1, nb):
        p = parent[i]
        qj = s3.q_from_axis_angle(axis_c[i], qpos[i - 1])
        Rj = s3.q_to_m33(qj)
        Rpc = Rj if jrot_identity[i] else s3.m33_mm(jrot_c[i], Rj)
        rot.append(s3.m33_mm(rot[p], Rpc))
        pos.append(s3.v3_add(pos[p], s3.m33_mv(rot[p], jpos_c[i])))

    px, py = [], []
    for k in range(ncp):
        b = cp_body[k]
        pw = s3.v3_add(pos[b], s3.m33_mv(rot[b], cp_pos_c[k]))
        px.append(pw[0])
        py.append(pw[1])
    return jnp.stack(px), jnp.stack(py)
