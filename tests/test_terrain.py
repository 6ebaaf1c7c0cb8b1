import jax.numpy as jnp
import numpy as np

from ti5_isaacgym_tpu.physics.contact import sample_height, sample_height_min3, surface_normal
from ti5_isaacgym_tpu.terrain import Terrain, TerrainCfg
from ti5_isaacgym_tpu.terrain import generators as G


def small_cfg(**kw):
    base = dict(num_rows=4, num_cols=4, border_size=5.0)
    base.update(kw)
    return TerrainCfg(**base)


def test_grid_dimensions_and_origins():
    cfg = small_cfg()
    t = Terrain(cfg, seed=0)
    assert t.height_field_raw.shape == (4 * 80 + 100, 4 * 80 + 100)
    assert t.env_origins.shape == (4, 4, 3)
    # origins centered in each cell
    np.testing.assert_allclose(t.env_origins[0, 0, :2], [4.0, 4.0])
    np.testing.assert_allclose(t.env_origins[2, 1, :2], [20.0, 12.0])


def test_t1_proportions_layout():
    """t1 config: 50% flat, 30% rough flat, 10% slope up, 10% slope down —
    column index selects type deterministically under curriculum."""
    cfg = small_cfg(num_cols=10, num_rows=3)
    t = Terrain(cfg, seed=0)
    types = t.terrain_type_grid[1]  # any row
    assert (types[:5] == 1).all(), types      # flat
    assert (types[5:8] == 2).all(), types     # rough flat
    assert types[8] == 3 and types[9] == 4    # slope up / down


def test_heightfield_sampling_roundtrip():
    cfg = small_cfg()
    t = Terrain(cfg, seed=1)
    hf = t.heightfield()
    # the world origin of cell (i,j) maps back into the heightfield
    for (i, j) in [(0, 0), (3, 2)]:
        ox, oy, oz = t.env_origins[i, j]
        h = float(sample_height(hf, jnp.array([ox, oy])))
        assert h <= oz + 1e-4  # spawn z is the max of the center patch
        assert abs(h - oz) < 0.2


def test_flat_cells_are_flat():
    cfg = small_cfg(num_cols=2, terrain_proportions=(1.0,))
    t = Terrain(cfg, seed=0)
    assert np.all(t.height_field_raw == 0)
    hf = t.heightfield()
    assert float(sample_height(hf, jnp.array([4.0, 4.0]))) == 0.0
    n = surface_normal(hf, jnp.array([4.0, 4.0]))
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-6)


def test_slope_has_gradient_normal():
    cfg = small_cfg(num_cols=1, num_rows=2, terrain_proportions=(0, 0, 0, 1.0))
    t = Terrain(cfg, seed=0)
    hf = t.heightfield()
    # off-center on the pyramid, normal should deviate from vertical
    ox, oy, _ = t.env_origins[1, 0]
    n = np.asarray(surface_normal(hf, jnp.array([ox + 2.5, oy])))
    assert n[2] < 1.0 and abs(n[0]) > 1e-3


def test_min3_sample_is_conservative():
    cfg = small_cfg(num_cols=1, num_rows=2, terrain_proportions=(0, 1.0))
    t = Terrain(cfg, seed=2)
    hf = t.heightfield()
    pts = jnp.array([[4.0 + 0.37 * k, 4.0 + 0.21 * k] for k in range(8)])
    h3 = sample_height_min3(hf, pts)
    hb = sample_height(hf, pts)
    assert np.all(np.asarray(h3) <= np.asarray(hb) + 1e-5)


def test_generators_shapes():
    t = G.SubTerrain(80, 80, 0.005, 0.1)
    G.pyramid_stairs(t, 0.25, 0.1, platform_size=3.0)
    assert t.height_field_raw.max() > 0
    t2 = G.SubTerrain(80, 80, 0.005, 0.1)
    G.wave(t2, 3, 0.3)
    assert t2.height_field_raw.min() < 0 < t2.height_field_raw.max()
    t3 = G.SubTerrain(80, 80, 0.005, 0.1)
    G.pit(t3, depth=0.5, platform_size=3.0)
    assert t3.height_field_raw.min() == -100
    t4 = G.SubTerrain(80, 80, 0.005, 0.1)
    G.discrete_obstacles(t4, 0.05, 1.0, 2.0, 20, platform_size=3.0)
    assert t4.height_field_raw[40, 40] == 0  # platform preserved


def test_cell_cache_matches_bilinear_sample():
    """Frozen-cell corners + analytic bilinear == the exact sampler
    (within a cell), and the gradient matches finite differences of the
    bilinear surface."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ti5_isaacgym_tpu.physics.contact import (
        HeightField, CellCache, gather_contact_cells, packed_cell_corners,
        sample_height)

    rng = np.random.RandomState(0)
    height = jnp.asarray(rng.rand(33, 41).astype(np.float32))
    hf = HeightField(height=height, hscale=0.1, offset=0.5)

    px = jnp.asarray(rng.uniform(0.0, 2.5, size=(5, 64)).astype(np.float32))
    py = jnp.asarray(rng.uniform(0.0, 3.0, size=(5, 64)).astype(np.float32))
    cells = gather_contact_cells(hf, packed_cell_corners(height), px, py)

    fu = (px - cells.x0) / hf.hscale
    fv = (py - cells.y0) / hf.hscale
    gu, gv = 1.0 - fu, 1.0 - fv
    h_cell = (cells.h00 * gu * gv + cells.h10 * fu * gv
              + cells.h01 * gu * fv + cells.h11 * fu * fv)
    h_exact = sample_height(hf, jnp.stack([px, py], axis=-1))
    np.testing.assert_allclose(np.asarray(h_cell), np.asarray(h_exact),
                               rtol=0, atol=5e-6)

    # analytic gradient vs FD of the frozen-cell surface
    dhdx = ((cells.h10 - cells.h00) * gv + (cells.h11 - cells.h01) * fv) / hf.hscale
    eps = 1e-3
    fu_e = (px + eps - cells.x0) / hf.hscale
    h_e = (cells.h00 * (1 - fu_e) * gv + cells.h10 * fu_e * gv
           + cells.h01 * (1 - fu_e) * fv + cells.h11 * fu_e * fv)
    np.testing.assert_allclose(np.asarray((h_e - h_cell) / eps),
                               np.asarray(dhdx), rtol=1e-2, atol=1e-3)


def test_supercell_matches_gather_contact_cells():
    """One-patch-per-env supercell extraction must reproduce the per-point
    packed-corner gather exactly for points within the margin of the base."""
    import jax.numpy as jnp
    import numpy as np

    from ti5_isaacgym_tpu.physics.contact import (
        HeightField, build_supertable, gather_cells_supercell,
        gather_contact_cells, packed_cell_corners)

    rng = np.random.RandomState(3)
    height = jnp.asarray(rng.rand(57, 49).astype(np.float32))
    hf = HeightField(height=height, hscale=0.1, offset=0.5)
    stb = build_supertable(np.asarray(height), 0.1, 0.5,
                           supercell=8, margin_m=0.7)

    K, N = 7, 96
    bx = jnp.asarray(rng.uniform(0.0, 4.5, size=N).astype(np.float32))
    by = jnp.asarray(rng.uniform(0.0, 4.0, size=N).astype(np.float32))
    off = rng.uniform(-0.68, 0.68, size=(2, K, N)).astype(np.float32)
    px = bx[None] + jnp.asarray(off[0])
    py = by[None] + jnp.asarray(off[1])

    want = gather_contact_cells(hf, packed_cell_corners(height), px, py)
    got = gather_cells_supercell(stb, bx, by, px, py)
    # cell selection (x0/y0) must be exact; heights are bf16-stored, so match
    # to bf16 ulp (~2^-9 for values in [0,1))
    for f in ("x0", "y0"):
        np.testing.assert_allclose(np.asarray(getattr(got, f)),
                                   np.asarray(getattr(want, f)),
                                   rtol=0, atol=1e-6, err_msg=f)
    for f in ("h00", "h10", "h01", "h11"):
        np.testing.assert_allclose(np.asarray(getattr(got, f)),
                                   np.asarray(getattr(want, f)),
                                   rtol=0, atol=3e-3, err_msg=f)

    # 2-D batch layout round-trips identically
    got2 = gather_cells_supercell(
        stb, bx.reshape(8, 12), by.reshape(8, 12),
        px.reshape(K, 8, 12), py.reshape(K, 8, 12))
    np.testing.assert_allclose(np.asarray(got2.h11).reshape(K, N),
                               np.asarray(got.h11), rtol=0, atol=1e-6)


def test_max_cp_reach_bounds_fk():
    """The env's collision-point reach bound must dominate true FK distances
    in random configurations (it sizes the supercell margin)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ti5_isaacgym_tpu.configs.t1_dh_stand import T1EnvCfg
    from ti5_isaacgym_tpu.envs.t1_dh_stand import T1DHStandEnv
    from ti5_isaacgym_tpu.physics.engine_core import contact_point_xy
    from ti5_isaacgym_tpu.physics.engine import PhysicsState

    cfg = T1EnvCfg()
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, num_envs=32),
        terrain=dataclasses.replace(cfg.terrain, mesh_type="plane"))
    env = T1DHStandEnv(cfg)
    reach = env._max_cp_reach()

    rng = np.random.RandomState(0)
    n = 32
    q = rng.uniform(-2.0, 2.0, size=(n, 12)).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    phys = PhysicsState(
        base_pos=jnp.zeros((n, 3)), base_quat=jnp.asarray(quat),
        base_vel=jnp.zeros((n, 6)), qpos=jnp.asarray(q),
        qvel=jnp.zeros((n, 12)),
        cp_anchor=jnp.zeros((n, env.model.cp_pos.shape[0], 3)))
    px, py = jax.jit(lambda s: contact_point_xy(env.model, s))(phys)
    d = np.sqrt(np.asarray(px) ** 2 + np.asarray(py) ** 2)
    assert d.max() <= reach + 1e-4, (d.max(), reach)
