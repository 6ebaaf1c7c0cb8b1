"""Pallas TPU megakernel: the full 1 kHz decimation loop in ONE kernel launch.

Why: the XLA lowering of the component-form substep compiles to ~270 small
VPU fusions per substep; at [8, N/8] shapes each kernel is ~1-2 us of launch
overhead for <1 us of math, so the 10-substep scan is LAUNCH-bound
(~470 us/step @4096 envs, of which <100 us is arithmetic).  Fusing the whole
decimation loop — PD torque law (with pre-resolved action lag), the physics
substeps (:func:`~ti5_isaacgym_tpu.physics.engine_core.substep_stacked`),
and the dof/IMU lag snapshots — into one `pl.pallas_call` removes ~2700
kernel launches and every HBM round-trip of the scan carry per policy step.

Data contract (everything f32, env axis folded to [8, M], lanes = M):

* inputs/outputs are ROW-PACKED: one array [rows, 8, M] per logical group,
  sliced by static/dynamic row index inside the kernel (leading-dim slicing
  of a VMEM value is layout-free; no transposes anywhere);
* action lag is resolved OUTSIDE the kernel: within one policy step the
  pushed action is constant, so the lagged action of substep k is
  ``where(lag <= k, a_t, prev_ring[lag-k-1])`` — precomputed for k=0..dec-1
  as a [dec*nd, 8, M] input (reference semantics: push-then-read each
  substep, ``legged_robot.py:1033-1045``);
* per-substep torque-multiplier noise is sampled OUTSIDE with jax.random
  (the reference resamples it inside ``_compute_torques`` at 1 kHz);
* the kernel emits per-substep dof (qpos,qvel) and IMU (ang vel, euler)
  snapshots, newest LAST; the env converts them into its newest-first
  shift-ring lag buffers with one concatenate per policy step instead of
  ten.

The grid tiles the lane axis so each program's working set stays well under
VMEM while Mosaic double-buffers the HBM traffic.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import spatial3 as s3
from .contact import CellCache, ContactOpts
from .engine import SolverOpts
from .engine_core import ModelConsts, ctx_row_layout, ctx_stack_rows, substep_stacked


def _rows(xs):
    """list of [8, M] arrays -> [len(xs), 8, M]."""
    return jnp.stack(xs, axis=0)


def run_decimation(
    mc: ModelConsts,
    hscale: float,
    copts: ContactOpts,
    sopts: SolverOpts,
    decimation: int,
    default_q,                     # [nd] python/np consts
    torque_limits,                 # [nd] python/np consts
    cp_meff,                       # [ncp, 2] np consts
    use_coulomb: bool,
    use_noise: bool,
    state_rows: jnp.ndarray,       # [37, 8, M] bp3 bq4 bw3 bv3 qpos12 qvel12
    anchor_rows: jnp.ndarray,      # [3*ncp, 8, M] ax | ay | az
    cell_rows: jnp.ndarray,        # [6*ncp, 8, M] x0|y0|h00|h10|h01|h11
    dyn_rows: jnp.ndarray,         # [13nb+nd+2, 8, M] mass com inert arma fric rest
    ctrl_rows: jnp.ndarray,        # [5*nd, 8, M] p d offs coul visc
    lagged_rows: jnp.ndarray,      # [dec*nd, 8, M] pre-scaled lag-resolved actions
    noise_rows: jnp.ndarray,       # [dec*nd, 8, M] torque multipliers
    extw_rows: jnp.ndarray,        # [6, 8, M] world force+torque, substep 0 only
    meff_rows: jnp.ndarray = None,  # [2*ncp, 8, M] contact apparent masses
    interpret: bool = False,
    lane_chunk: int = 128,
    feet_bodies: list = None,       # body indices for the ctx output
    knee_bodies: list = None,
    vma: str = None,                # mesh axis name when called under shard_map
) -> Tuple[jnp.ndarray, ...]:
    """One launch for the whole decimation loop.

    Returns (state_rows' [37], anchor_rows' [3*ncp], force_rows [3*nb],
    torque_rows [nd], dof_snap_rows [dec*2*nd] newest-LAST,
    imu_snap_rows [dec*7: angvel3+quat4] newest-LAST,
    ctx_rows [24] — post-step feet/knee kinematics, see
    :func:`~ti5_isaacgym_tpu.physics.engine_core.ctx_stack_rows`; emitted
    only when ``feet_bodies``/``knee_bodies`` are given), all [rows, 8, M].

    The ctx output folds the env's post-physics FK (reward/termination
    context) into the same launch: one extra component-form FK on the final
    state instead of a separate ~1.4 ms XLA kernel chain per policy step.
    """
    nb, nd, ncp = mc.nb, mc.nd, mc.ncp
    dec = int(decimation)
    tl = [float(t) for t in np.asarray(torque_limits)]
    dq_c = [float(t) for t in np.asarray(default_q)]
    cp_meff = np.asarray(cp_meff)
    eight, m = int(state_rows.shape[1]), int(state_rows.shape[2])
    if meff_rows is None:
        meff_rows = jnp.broadcast_to(
            jnp.asarray(cp_meff.T.reshape(2 * ncp), jnp.float32)[:, None, None],
            (2 * ncp, eight, m))

    with_ctx = feet_bodies is not None and knee_bodies is not None

    def kernel(st_ref, an_ref, cl_ref, dy_ref, ct_ref, la_ref, no_ref, ew_ref,
               me_ref, st_out, an_out, fo_out, tq_out, ds_out, is_out,
               cx_out=None):
        st = st_ref[...]
        an = an_ref[...]
        cl = cl_ref[...]
        dy = dy_ref[...]
        ct = ct_ref[...]
        ew = ew_ref[...]
        me = me_ref[...]

        cells = CellCache(x0=cl[0:ncp], y0=cl[ncp:2 * ncp],
                          h00=cl[2 * ncp:3 * ncp], h10=cl[3 * ncp:4 * ncp],
                          h01=cl[4 * ncp:5 * ncp], h11=cl[5 * ncp:6 * ncp])

        mass = [dy[i] for i in range(nb)]
        com = [(dy[nb + 3 * i], dy[nb + 3 * i + 1], dy[nb + 3 * i + 2])
               for i in range(nb)]
        o = 4 * nb
        inert = [tuple(tuple(dy[o + 9 * i + 3 * r + c] for c in range(3))
                       for r in range(3)) for i in range(nb)]
        o += 9 * nb
        arma = [dy[o + j] for j in range(nd)]
        friction = dy[o + nd]
        restitution = dy[o + nd + 1]
        p_g = [ct[j] for j in range(nd)]
        d_g = [ct[nd + j] for j in range(nd)]
        offs = [ct[2 * nd + j] for j in range(nd)]
        coul = [ct[3 * nd + j] for j in range(nd)]
        visc = [ct[4 * nd + j] for j in range(nd)]

        carry = (
            (st[0], st[1], st[2]),
            (st[3], st[4], st[5], st[6]),
            (st[7], st[8], st[9]),
            (st[10], st[11], st[12]),
            tuple(st[13 + j] for j in range(nd)),
            tuple(st[13 + nd + j] for j in range(nd)),
            an[0:ncp], an[ncp:2 * ncp], an[2 * ncp:3 * ncp],
        )

        def body(k, carry):
            bp, bq, bw, bv, qpos, qvel, ax_, ay_, az_ = carry
            lag_k = la_ref[pl.ds(k * nd, nd)]
            no_k = no_ref[pl.ds(k * nd, nd)]
            tau = []
            for j in range(nd):
                t = (p_g[j] * (lag_k[j] + dq_c[j] - qpos[j] + offs[j])
                     - d_g[j] * qvel[j])
                if use_coulomb:
                    t = t - visc[j] * qvel[j] - coul[j] * jnp.sign(qvel[j])
                if use_noise:
                    t = t * no_k[j]
                tau.append(jnp.clip(t, -tl[j], tl[j]))

            on = (k == 0).astype(jnp.float32)
            comps = dict(
                bp=bp, bq=bq, bw=bw, bv=bv,
                qpos=list(qpos), qvel=list(qvel), tau=tau,
                mass=mass, com=com, inert=inert, arma=arma,
                friction=friction, restitution=restitution,
                ax=ax_, ay=ay_, az=az_,
                mn=me[0:ncp], mt=me[ncp:2 * ncp],
                bf=(ew[0] * on, ew[1] * on, ew[2] * on),
                bt=(ew[3] * on, ew[4] * on, ew[5] * on),
            )
            out = substep_stacked(mc, hscale, copts, sopts, comps,
                                  cells=cells, cp_meff=cp_meff)

            tq_out[...] = _rows(tau)
            ds_out[pl.ds(k * 2 * nd, 2 * nd)] = _rows(
                list(out["qpos"]) + list(out["qvel"]))
            # IMU snapshot: angular velocity + quaternion (euler extraction
            # needs atan2, which Mosaic lacks — the env derives euler from
            # these quats outside the kernel, once per policy step)
            is_out[pl.ds(k * 7, 7)] = _rows(
                [out["bw"][0], out["bw"][1], out["bw"][2],
                 out["bq"][0], out["bq"][1], out["bq"][2], out["bq"][3]])
            fo = []
            for b in range(nb):
                fo.extend([out["f_body"][b][0], out["f_body"][b][1],
                           out["f_body"][b][2]])
            fo_out[...] = _rows(fo)

            return (out["bp"], out["bq"], out["bw"], out["bv"],
                    tuple(out["qpos"]), tuple(out["qvel"]),
                    out["nax"], out["nay"], out["naz"])

        carry = jax.lax.fori_loop(0, dec, body, carry)
        bp, bq, bw, bv, qpos, qvel, ax_, ay_, az_ = carry
        st_out[...] = _rows(list(bp) + list(bq) + list(bw) + list(bv)
                            + list(qpos) + list(qvel))
        an_out[...] = jnp.concatenate([ax_, ay_, az_], axis=0)
        if with_ctx:
            cx_out[...] = _rows(ctx_stack_rows(
                mc, feet_bodies, knee_bodies, bp, bq, bw, bv,
                list(qpos), list(qvel)))

    ch = min(lane_chunk, m)
    grid = (pl.cdiv(m, ch),)

    def in_spec(rows):
        return pl.BlockSpec((rows, eight, ch), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    out_rows = (37, 3 * ncp, 3 * nb, nd, dec * 2 * nd, dec * 7)
    if with_ctx:
        out_rows = out_rows + (
            ctx_row_layout(len(feet_bodies), len(knee_bodies))["total"],)
    # under shard_map with check_vma, outputs must declare which mesh axes
    # they vary over (all of them: the kernel is pure per-env data parallel)
    vma_set = frozenset([vma]) if vma else None
    if vma_set:
        out_shape = tuple(jax.ShapeDtypeStruct((r, eight, m), jnp.float32,
                                               vma=vma_set) for r in out_rows)
    else:
        out_shape = tuple(jax.ShapeDtypeStruct((r, eight, m), jnp.float32)
                          for r in out_rows)
    inputs = (state_rows, anchor_rows, cell_rows, dyn_rows, ctrl_rows,
              lagged_rows, noise_rows, extw_rows, meff_rows)
    if vma_set:
        # under shard_map with the varying-axes checker, inputs that happen
        # to be mesh-wide constants (e.g. noise_rows == ones when a DR flag
        # is off) are typed unvarying; the kernel's outputs are declared
        # varying, so promote any not-yet-varying input for a consistent type
        def to_varying(a):
            have = getattr(jax.typeof(a), "vma", frozenset())
            missing = tuple(ax for ax in vma_set if ax not in have)
            return jax.lax.pvary(a, missing) if missing else a

        inputs = tuple(to_varying(a) for a in inputs)
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[in_spec(int(a.shape[0])) for a in inputs],
        out_specs=tuple(in_spec(r) for r in out_rows),
        out_shape=out_shape,
        interpret=interpret,
    )
    return fn(*inputs)
