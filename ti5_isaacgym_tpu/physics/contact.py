"""Point-vs-heightfield contact for the TPU-native engine.

Replaces the PhysX TGS contact solver used by the reference
(``legged_robot_config.py:309-320``) with a compliant (penalty) contact model
evaluated at a fixed set of collision points — box corners and foot-sole
corners extracted from the robot's collision geometry
(``tools/extract_model.py``).  At the 1 kHz physics rate used by the task
(``t1_dh_stand_config.py:160``) a critically-damped spring-damper normal force
with a regularized Coulomb friction cone is stable and produces
contact-force magnitudes in the same regime the reference's reward terms
expect (e.g. the 5 N contact threshold at ``t1_dh_stand_env.py:377`` and the
500 N penalty knee at ``:684``).

Heightfield lookups are bilinear gathers on a device-resident array; normals
come from the analytic gradient of the interpolated surface — everything is
branch-free and fuses into the surrounding physics step under ``jit``.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HeightField:
    """Device-resident terrain height map.

    ``height[i, j]`` is the terrain height (meters) at world
    ``x = i * hscale - offset, y = j * hscale - offset`` — matching the
    reference's border convention (``utils/terrain.py:29-31``, height lookup
    ``legged_robot.py:1551-1587``).
    """

    height: jnp.ndarray                                  # (rows, cols) f32 meters
    hscale: float = struct.field(pytree_node=False)      # horizontal scale [m/px]
    offset: float = struct.field(pytree_node=False)      # border size [m]


def flat_terrain() -> HeightField:
    return HeightField(height=jnp.zeros((2, 2), jnp.float32), hscale=1.0, offset=1.0)


def sample_height(hf: HeightField, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear height sample at world xy (..., 2) -> (...)."""
    u = (xy[..., 0] + hf.offset) / hf.hscale
    v = (xy[..., 1] + hf.offset) / hf.hscale
    rows, cols = hf.height.shape
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, rows - 2)
    j0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, cols - 2)
    fu = jnp.clip(u - i0, 0.0, 1.0)
    fv = jnp.clip(v - j0, 0.0, 1.0)
    h00 = hf.height[i0, j0]
    h10 = hf.height[i0 + 1, j0]
    h01 = hf.height[i0, j0 + 1]
    h11 = hf.height[i0 + 1, j0 + 1]
    return (
        h00 * (1 - fu) * (1 - fv)
        + h10 * fu * (1 - fv)
        + h01 * (1 - fu) * fv
        + h11 * fu * fv
    )


def sample_height_min3(hf: HeightField, xy: jnp.ndarray) -> jnp.ndarray:
    """Conservative min-of-3-texels sample used for height-scan observations.

    Mirrors the reference's ``_get_heights`` lookup
    (``legged_robot.py:1575-1583``: min of (i,j), (i+1,j), (i,j+1)).
    """
    u = (xy[..., 0] + hf.offset) / hf.hscale
    v = (xy[..., 1] + hf.offset) / hf.hscale
    rows, cols = hf.height.shape
    i0 = jnp.clip(u.astype(jnp.int32), 0, rows - 2)
    j0 = jnp.clip(v.astype(jnp.int32), 0, cols - 2)
    return jnp.minimum(jnp.minimum(hf.height[i0, j0], hf.height[i0 + 1, j0]), hf.height[i0, j0 + 1])


def surface_normal(hf: HeightField, xy: jnp.ndarray) -> jnp.ndarray:
    """Unit surface normal from the height gradient, (...,2) -> (...,3)."""
    eps = hf.hscale * 0.5
    ex = jnp.stack([jnp.full_like(xy[..., 0], eps), jnp.zeros_like(xy[..., 0])], axis=-1)
    ey = jnp.stack([jnp.zeros_like(xy[..., 0]), jnp.full_like(xy[..., 0], eps)], axis=-1)
    dhdx = (sample_height(hf, xy + ex) - sample_height(hf, xy - ex)) / (2 * eps)
    dhdy = (sample_height(hf, xy + ey) - sample_height(hf, xy - ey)) / (2 * eps)
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


@struct.dataclass
class CellCache:
    """Frozen bilinear cell per contact point — the TPU-native heightfield
    lookup.

    XLA:TPU lowers arbitrary gathers at ~20-50 ns per gathered fragment, so
    the reference-style per-substep height sampling (20 gathers x [ncp, N]
    per 1 kHz substep) costs ~100x the rest of the physics.  Instead the env
    gathers each contact point's 2x2 cell corners ONCE per policy step (one
    element-gather from a corner-packed table, trailing dim contiguous) and
    the 10 substeps evaluate height and the analytic bilinear gradient from
    these frozen corners with pure arithmetic — zero gathers in the hot loop.

    Freezing the cell for one policy step (10 ms) is sound: contact points
    move ~2 cm per step at walking speeds while cells are 10 cm; outside the
    cell the bilinear surface extrapolates continuously.  PhysX's triangle-
    mesh heightfield likewise resolves a contact against a single static
    triangle per solver step (reference ``legged_robot.py:1216-1241``).

    All arrays are [ncp, ...batch] f32 (points ride the sublanes, envs the
    lanes — same layout as the substep's contact math).
    """

    x0: jnp.ndarray   # world x of the cell's (i0, j0) corner
    y0: jnp.ndarray   # world y of the cell's (i0, j0) corner
    h00: jnp.ndarray
    h10: jnp.ndarray
    h01: jnp.ndarray
    h11: jnp.ndarray


def packed_cell_corners(height: jnp.ndarray) -> jnp.ndarray:
    """[rows, cols] height map -> [rows*cols, 4] per-cell corner table.

    Entry ``i*cols + j`` holds ``(h[i,j], h[i+1,j], h[i,j+1], h[i+1,j+1])``
    (edge rows/cols replicate), so one element-gather with a contiguous
    trailing dimension fetches a full bilinear cell.
    """
    h00 = height
    h10 = jnp.concatenate([height[1:], height[-1:]], axis=0)
    h01 = jnp.concatenate([height[:, 1:], height[:, -1:]], axis=1)
    h11 = jnp.concatenate([h10[:, 1:], h10[:, -1:]], axis=1)
    return jnp.stack([h00, h10, h01, h11], axis=-1).reshape(-1, 4)


def gather_contact_cells(hf: HeightField, packed: jnp.ndarray,
                         px: jnp.ndarray, py: jnp.ndarray) -> CellCache:
    """One gather of every contact point's bilinear cell.

    Args:
      packed: ``packed_cell_corners(hf.height)``.
      px, py: [ncp, N] world xy of the contact points.
    """
    rows, cols = hf.height.shape
    u = (px + hf.offset) / hf.hscale
    v = (py + hf.offset) / hf.hscale
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, rows - 2)
    j0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, cols - 2)
    corners = jnp.take(packed, i0 * cols + j0, axis=0, mode="clip")  # [..., 4]
    return CellCache(
        x0=i0.astype(jnp.float32) * hf.hscale - hf.offset,
        y0=j0.astype(jnp.float32) * hf.hscale - hf.offset,
        h00=corners[..., 0], h10=corners[..., 1],
        h01=corners[..., 2], h11=corners[..., 3],
    )


def flat_cell_cache(px: jnp.ndarray, py: jnp.ndarray) -> CellCache:
    """Analytic all-zero cell cache for plane terrain (no gather at all)."""
    z = jnp.zeros_like(px)
    return CellCache(x0=jnp.floor(px), y0=jnp.floor(py),
                     h00=z, h10=z, h01=z, h11=z)


@struct.dataclass
class SuperTable:
    """Per-supercell contiguous terrain patches — one gather fragment per env.

    Even the packed-corner cell gather costs one HBM fragment per contact
    point (~50 ns each on TPU -> 32 x N fragments dominate the policy step).
    All 32 points of an env lie within ``margin`` meters of its base, so the
    terrain is tiled into ``S x S``-cell supercells and, for each, the full
    ``(S + 2 M + 1)^2`` corner grid covering every possible point position is
    stored as ONE contiguous table row.  Per policy step each env gathers its
    single patch row (N fragments total, 32x fewer) and every point's 2x2
    bilinear cell corners are extracted from the in-register patch with
    one-hot row/column contractions — MXU work instead of random HBM access.

    Static terrain only (built once at env construction, in numpy).
    """

    table: jnp.ndarray                                  # [nsi*nsj, PG*PG] f32
    S: int = struct.field(pytree_node=False)            # supercell side [cells]
    M: int = struct.field(pytree_node=False)            # margin [cells]
    PG: int = struct.field(pytree_node=False)           # corner-grid side
    nsi: int = struct.field(pytree_node=False)
    nsj: int = struct.field(pytree_node=False)
    rows: int = struct.field(pytree_node=False)         # heightfield rows
    cols: int = struct.field(pytree_node=False)
    hscale: float = struct.field(pytree_node=False)
    offset: float = struct.field(pytree_node=False)


def build_supertable(height, hscale: float, offset: float,
                     supercell: int = 16, margin_m: float = 1.3) -> SuperTable:
    """Precompute the supercell patch table from a (numpy) heightfield."""
    import numpy as np

    H = np.asarray(height, np.float32)
    R, C = H.shape
    S = int(supercell)
    M = int(np.ceil(margin_m / hscale))
    PG = S + 2 * M + 1
    nsi = (R + S - 1) // S
    nsj = (C + S - 1) // S
    # pad so patch [si*S-M, si*S-M+PG) is always in range (edge replicate,
    # matching the clipped lookup of gather_contact_cells)
    Hp = np.pad(H, ((M, nsi * S - R + M + PG), (M, nsj * S - C + M + PG)),
                mode="edge")
    sw = np.lib.stride_tricks.sliding_window_view(Hp, (PG, PG))[::S, ::S]
    st = np.ascontiguousarray(sw[:nsi, :nsj]).reshape(nsi * nsj, PG * PG)
    # bf16 storage: halves the gather bandwidth and lets the one-hot corner
    # extraction run on the MXU at bf16 rate.  The resulting <= 2^-8 relative
    # height error (~4 mm at 2 m elevation) is the same order as the int16
    # quantization PhysX heightfields apply (vertical_scale=0.005,
    # reference utils/terrain.py:29-31) — the selection itself stays exact
    # because each one-hot row has a single nonzero.
    return SuperTable(table=jnp.asarray(st, jnp.bfloat16), S=S, M=M, PG=PG,
                      nsi=nsi, nsj=nsj, rows=R, cols=C, hscale=float(hscale),
                      offset=float(offset))


def gather_cells_supercell(stb: SuperTable, base_x, base_y,
                           px: jnp.ndarray, py: jnp.ndarray) -> CellCache:
    """CellCache via one patch gather per env + one-hot corner extraction.

    Args:
      base_x, base_y: [...B] world xy of each env's base (patch anchor).
      px, py: [K, ...B] world xy of the contact points.  Points farther than
        the table margin from the base clamp to the patch edge (graceful
        degradation; the margin is sized to the robot's maximum reach).
    Returns CellCache with [K, ...B] fields, identical to
    :func:`gather_contact_cells` for in-margin points.
    """
    K = px.shape[0]
    batch = px.shape[1:]
    n = 1
    for d in batch:
        n *= d
    pu = ((px + stb.offset) / stb.hscale).reshape(K, n)
    pv = ((py + stb.offset) / stb.hscale).reshape(K, n)
    bu = ((base_x + stb.offset) / stb.hscale).reshape(n)
    bv = ((base_y + stb.offset) / stb.hscale).reshape(n)

    si = jnp.clip((bu / stb.S).astype(jnp.int32), 0, stb.nsi - 1)
    sj = jnp.clip((bv / stb.S).astype(jnp.int32), 0, stb.nsj - 1)
    patch = jnp.take(stb.table, si * stb.nsj + sj, axis=0)      # [n, PG*PG]
    patch = patch.reshape(n, stb.PG, stb.PG)

    # cell index within the patch; mirror gather_contact_cells' global clip
    # to [0, rows-2] before the patch-local clamp
    ou = si * stb.S - stb.M                                     # patch origin
    ov = sj * stb.S - stb.M
    i0 = jnp.clip(jnp.floor(pu).astype(jnp.int32), 0, stb.rows - 2)
    j0 = jnp.clip(jnp.floor(pv).astype(jnp.int32), 0, stb.cols - 2)
    iu = jnp.clip(i0 - ou[None], 0, stb.PG - 2)                 # [K, n]
    iv = jnp.clip(j0 - ov[None], 0, stb.PG - 2)

    r = jnp.arange(stb.PG, dtype=jnp.int32)
    iuT, ivT = iu.T, iv.T                                       # [n, K]
    # one contraction extracts rows i0 (first K) and i0+1 (second K).
    # bf16 intermediate: the [n, 2K, PG] buffer pads PG -> 128 lanes, so its
    # bytes dominate this chain (round-5 profile: the f32 version's fusions
    # cost ~1.27 ms/policy step at 8192 envs; bf16 cuts the padded traffic
    # in half, measured -22 % on tools/exp_supercell_extract.py).  Exact:
    # each one-hot row has a single nonzero, so the "sum" copies a stored
    # bf16 height unchanged; the final f32 accumulation is over one term.
    sel_r = jnp.concatenate([
        (iuT[..., None] == r), (iuT[..., None] == (r - 1))],
        axis=1).astype(jnp.bfloat16)                            # [n, 2K, PG]
    rows = jnp.einsum("nkr,nrc->nkc", sel_r, patch,
                      preferred_element_type=jnp.bfloat16)      # [n, 2K, PG]
    rows0, rows1 = rows[:, :K], rows[:, K:]
    sel_c0 = (ivT[..., None] == r).astype(jnp.bfloat16)
    sel_c1 = (ivT[..., None] == (r - 1)).astype(jnp.bfloat16)

    def _pick(rows_, sel_):
        return jnp.sum((rows_ * sel_).astype(jnp.float32), -1).T

    h00 = _pick(rows0, sel_c0)                                  # [K, n]
    h01 = _pick(rows0, sel_c1)
    h10 = _pick(rows1, sel_c0)
    h11 = _pick(rows1, sel_c1)

    shape = (K,) + batch
    x0 = (ou[None] + iu).astype(jnp.float32) * stb.hscale - stb.offset
    y0 = (ov[None] + iv).astype(jnp.float32) * stb.hscale - stb.offset
    return CellCache(
        x0=x0.reshape(shape), y0=y0.reshape(shape),
        h00=h00.reshape(shape), h10=h10.reshape(shape),
        h01=h01.reshape(shape), h11=h11.reshape(shape))


@struct.dataclass
class ContactOpts:
    """Compliant contact coefficients (trace-time constants).

    Stability strategy (the TPU-native answer to the PhysX TGS implicit
    solver the reference relies on, ``legged_robot_config.py:309-320``):

    * **normal**: the spring-damper force uses an implicit-rate
      discretization — solving ``v+ = v + dt f / m``, ``f = kp (d - dt v+)
      - kd v+`` for ``f`` — which is unconditionally stable for any
      stiffness even for a nearly massless foot link, while converging to
      the full ``kp * d`` static force for sustained contact;
    * **friction**: an anchor-spring (stick) model — each contact point
      remembers where it first stuck and is pulled back by a tangential
      spring, projected onto the Coulomb cone (the anchor slides when the
      cone saturates).  Sustained tangential loads are therefore carried
      statically, independent of the (tiny) apparent point mass; a pure
      velocity-based friction force cannot do this and either skates or
      chatters.  The same implicit-rate divisor keeps the stiff tangential
      spring stable.

    Both need a per-point apparent mass, probed once from the articulated
    inertia by :func:`~ti5_isaacgym_tpu.physics.engine.probe_contact_masses`.
    """

    kp: float = struct.field(pytree_node=False, default=2.0e6)    # normal stiffness [N/m]
    kd: float = struct.field(pytree_node=False, default=2.0e4)    # normal damping  [N s/m]
    kt: float = struct.field(pytree_node=False, default=2.0e6)    # tangential stiffness [N/m]
    kdt: float = struct.field(pytree_node=False, default=2.0e4)   # tangential damping [N s/m]
    max_depth: float = struct.field(pytree_node=False, default=0.05)
    max_force: float = struct.field(pytree_node=False, default=2.0e4)
    dt: float = struct.field(pytree_node=False, default=0.001)
    # PhysX maxDepenetrationVelocity (reference t1_dh_stand_config.py:172):
    # the normal force may stop the approach but can only impart up to this
    # much outward velocity per substep — deep-penetration spring energy is
    # dropped instead of released as launch (the "trampoline" failure mode).
    max_depen_vel: float = struct.field(pytree_node=False, default=1.0)


def point_contact_forces(
    hf: HeightField,
    opts: ContactOpts,
    p_w: jnp.ndarray,
    v_w: jnp.ndarray,
    anchor: jnp.ndarray,
    friction: jnp.ndarray,
    m_eff: jnp.ndarray,
    restitution: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Contact force at each collision point.

    Args:
      p_w: (np, 3) world positions, v_w: (np, 3) world velocities,
      anchor: (np, 3) friction anchor positions (state carried by the caller),
      friction: scalar (per-env) Coulomb friction coefficient,
      m_eff: (np, 2) apparent mass of each contact point along the normal
        ([:, 0]) and the weakest tangential direction ([:, 1]), already
        divided by the number of points sharing the body.
    Returns:
      (forces (np,3) world, penetration depth (np,), updated anchors (np,3)).
    """
    m_n, m_t = m_eff[..., 0], m_eff[..., 1]
    xy = p_w[..., :2]
    h = sample_height(hf, xy)
    n = surface_normal(hf, xy)
    gap = h - p_w[..., 2]
    depth = jnp.clip(gap * n[..., 2], 0.0, opts.max_depth)
    active = gap > 0.0
    v_n = jnp.sum(v_w * n, axis=-1)
    # implicit-rate spring-damper (see class docstring); per-env restitution
    # e scales the normal damping down (kd_eff = kd*(1-e)) — the compliant
    # analogue of the per-shape restitution the reference writes into PhysX
    # (legged_robot.py:803-820)
    if restitution is not None:
        k_v = opts.kp * opts.dt + opts.kd * (1.0 - restitution)
    else:
        k_v = opts.kp * opts.dt + opts.kd
    denom = 1.0 + opts.dt * k_v / m_n
    f_n = jnp.clip((opts.kp * depth - k_v * v_n) / denom, 0.0, opts.max_force) * active
    # depenetration-velocity cap (PhysX maxDepenetrationVelocity semantics)
    f_cap = jnp.maximum(m_n * (opts.max_depen_vel - v_n) / opts.dt, 0.0)
    f_n = jnp.minimum(f_n, f_cap)

    # tangential anchor spring, implicit-rate, projected on the friction cone
    v_t = v_w - v_n[..., None] * n
    d_t = p_w - anchor
    d_t = d_t - jnp.sum(d_t * n, axis=-1, keepdims=True) * n
    kt_v = opts.kt * opts.dt + opts.kdt
    denom_t = 1.0 + opts.dt * kt_v / m_t
    f_t_raw = -(opts.kt * d_t + kt_v * v_t) / denom_t[..., None]
    f_t_mag = jnp.linalg.norm(f_t_raw, axis=-1)
    cone = friction * f_n
    scale = jnp.where(f_t_mag > cone, cone / (f_t_mag + 1e-8), 1.0)
    f_t = f_t_raw * (scale * active)[..., None]

    # anchor update: stick -> keep; slide -> drag so the spring matches the
    # cone-projected force; separated -> reset to the current point.
    sliding = (f_t_mag > cone) & active
    anchor_slide = p_w + f_t / opts.kt * denom_t[..., None]
    new_anchor = jnp.where(active[..., None],
                           jnp.where(sliding[..., None], anchor_slide, anchor),
                           p_w)
    return n * f_n[..., None] + f_t, depth, new_anchor
