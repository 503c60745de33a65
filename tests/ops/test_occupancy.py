"""Occupancy-grid culling: lookup, top-K selection, scatter, and the
accelerated render path matching the dense render where the grid is
accurate."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.ops.occupancy import (
    OccupancyGrid,
    lookup,
    make_grid,
    scatter_outputs,
    select_samples,
)


def _sphere_grid(resolution=32, radius=0.5, cube_range=1.1):
    r = resolution
    line = (jnp.arange(r) + 0.5) / r * 2 * cube_range - cube_range
    xs, ys, zs = jnp.meshgrid(line, line, line, indexing="ij")
    inside = (xs**2 + ys**2 + zs**2) < radius**2
    return OccupancyGrid(inside.astype(jnp.float32), cube_range, 0.5)


def test_lookup_inside_outside():
    grid = _sphere_grid()
    pos = jnp.array([[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [5.0, 0.0, 0.0]]])
    occ = lookup(grid, pos)
    assert occ.shape == (1, 3)
    assert occ[0, 0] == 1.0  # center: occupied
    assert occ[0, 1] == 0.0  # inside cube, outside sphere
    assert occ[0, 2] == 0.0  # outside cube entirely


def test_fresh_grid_all_occupied():
    grid = make_grid(8, 1.1, 0.01)
    pos = jnp.zeros((2, 5, 3))
    assert bool(jnp.all(lookup(grid, pos) == 1.0))


def test_select_samples_prefers_occupied():
    dists = jnp.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]])
    occ = jnp.array([[0.0, 1.0, 0.0, 1.0, 1.0, 0.0]])
    sel_d, sel_i = select_samples(dists, occ, 3)
    np.testing.assert_array_equal(np.asarray(sel_i), [[1, 3, 4]])
    np.testing.assert_array_equal(np.asarray(sel_d), [[2.0, 4.0, 5.0]])


def test_select_samples_pads_with_empty_when_short():
    dists = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    occ = jnp.array([[0.0, 1.0, 0.0, 0.0]])
    sel_d, sel_i = select_samples(dists, occ, 3)
    # the single occupied sample plus the earliest empty ones
    assert 1 in np.asarray(sel_i)[0]
    assert sel_d.shape == (1, 3)


def test_scatter_roundtrip():
    vals = jnp.array([[10.0, 20.0], [30.0, 40.0]])
    idx = jnp.array([[1, 3], [0, 2]])
    out = scatter_outputs(vals, idx, 5)
    np.testing.assert_array_equal(
        np.asarray(out),
        [[0, 10, 0, 20, 0], [30, 0, 40, 0, 0]],
    )
    vals3 = jnp.ones((2, 2, 3))
    out3 = scatter_outputs(vals3, idx, 5)
    assert out3.shape == (2, 5, 3)
    assert float(out3.sum()) == 12.0


@pytest.fixture(scope="module")
def tiny_renderer():
    from neddf_tpu.render import NeRFRender

    return NeRFRender(
        network_config={
            "_target_": "neddf_tpu.fields.NeDDF",
            "embed_pos_rank": 4, "embed_dir_rank": 2,
            "ddf_layer_count": 4, "ddf_layer_width": 16,
            "col_layer_count": 3, "col_layer_width": 16,
            "skips": (1,), "d_near": 0.001,
        },
        sample_coarse=8, sample_fine=16,
        use_coarse_network=False, sampling_type="point",
    )


def test_accel_matches_dense_with_full_grid(tiny_renderer, key, calib_params):
    """With an all-occupied grid and budget == S the accelerated path
    must reproduce the dense render exactly."""
    from neddf_tpu.geometry import PinholeCalib

    r = tiny_renderer
    params = r.init(key)
    calib = PinholeCalib(calib_params)
    pose_r = jnp.eye(3)
    pose_t = jnp.array([0.0, 0.0, 4.0])
    uv = jnp.stack([jnp.arange(6, dtype=jnp.int32) * 50,
                    jnp.arange(6, dtype=jnp.int32) * 40], axis=1)
    grid = make_grid(16, 6.0, 0.0)  # everything occupied, covers rays
    dense = r.render_rays(params, calib, pose_r, pose_t, uv, key, -1)
    accel = r.render_rays_accel(
        params, calib, pose_r, pose_t, uv, key, grid,
        budget_coarse=9, budget_fine=26,  # == full sample axes
    )
    for k in ("color", "depth", "transmittance"):
        np.testing.assert_allclose(
            np.asarray(accel[k]), np.asarray(dense[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )


def test_accel_runs_with_tight_budget(tiny_renderer, key, calib_params):
    from neddf_tpu.geometry import PinholeCalib

    r = tiny_renderer
    params = r.init(key)
    calib = PinholeCalib(calib_params)
    uv = jnp.stack([jnp.arange(4, dtype=jnp.int32) * 50] * 2, axis=1)
    grid = make_grid(16, 6.0, 0.0)
    out = r.render_rays_accel(
        params, calib, jnp.eye(3), jnp.array([0.0, 0.0, 4.0]), uv, key, grid,
        budget_coarse=4, budget_fine=8,
    )
    assert out["color"].shape == (4, 3)
    assert bool(jnp.all(jnp.isfinite(out["color"])))


def test_coarsen_grid_pools_and_dilates():
    from neddf_tpu.ops.occupancy import coarsen_grid

    vals = jnp.zeros((16, 16, 16)).at[5, 9, 2].set(1.0)
    grid = OccupancyGrid(vals, 1.1, 0.5)
    coarse = coarsen_grid(grid, factor=4, dilate=0)
    assert coarse.resolution == 4
    occ = np.asarray(coarse.values) > 0.5
    assert occ[1, 2, 0] and occ.sum() == 1  # block containing (5,9,2)
    dilated = coarsen_grid(grid, factor=4, dilate=1)
    occd = np.asarray(dilated.values) > 0.5
    assert occd.sum() == 3 * 3 * 2  # 3^3 neighbourhood clipped at z=0
    # conservative: every fine-occupied point stays coarse-occupied
    assert occd[1, 2, 0]


def test_ray_active_hits_and_misses():
    from neddf_tpu.ops.occupancy import ray_active

    grid = _sphere_grid(radius=0.5)
    orig = jnp.array([[0.0, 0.0, -4.0], [0.0, 0.0, -4.0]])
    dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])  # hit / miss
    act = ray_active(grid, orig, dirs, 2.0, 6.0, 128)
    np.testing.assert_array_equal(np.asarray(act), [True, False])


def test_render_image_ray_cull_exact(tiny_renderer, key):
    """ray_cull active rays reproduce the dense render bitwise
    (chunk-invariant shared key); culled rays get the idealized
    all-empty composite the re-pack fills in.

    Geometry note: the calib is CENTERED on the rendered grid so central
    rays hit the sphere and corner rays miss the (dilated) cube — with
    the 800x800 fixture calib every test ray passes the cube corner and
    no ray is ever culled. The grid is 32^3 so the factor-4 coarse grid
    is 8^3: dilating a 4^3 coarse grid of a central sphere marks the
    whole cube occupied.
    """
    from neddf_tpu.geometry import PinholeCalib
    from neddf_tpu.geometry.camera import create_rays
    from neddf_tpu.ops.occupancy import coarsen_grid, ray_active

    r = tiny_renderer
    params = r.init(key)
    calib = PinholeCalib(jnp.array([300.0, 300.0, 128.0, 112.0]))
    pose_r, pose_t = jnp.eye(3), jnp.array([0.0, 0.0, 4.0])
    grid = _sphere_grid(resolution=32, radius=0.4)

    kwargs = dict(
        target_types=["color", "depth", "transmittance"],
        downsampling=32, chunk=64, key=jax.random.PRNGKey(3),
    )
    dense = r.render_image(
        params, calib, pose_r, pose_t, 300, 260, **kwargs
    )
    culled = r.render_image(
        params, calib, pose_r, pose_t, 300, 260,
        ray_cull=grid, ray_cull_factor=4, ray_cull_probes=64, **kwargs
    )
    # recompute the probe to know which pixels were culled
    h, w = dense["color"].shape[:2]
    us = (np.tile(np.arange(w), h) * 32).astype(np.int32)
    vs = (np.repeat(np.arange(h), w) * 32).astype(np.int32)
    rays = create_rays(
        calib, pose_r, pose_t, jnp.asarray(np.stack([us, vs], 1))
    )
    active = np.asarray(ray_active(
        coarsen_grid(grid, 4), rays.ray_orig, rays.ray_dir,
        r.dist_near, r.dist_far, 64,
    )).reshape(h, w)
    assert 0 < active.sum() < active.size  # both classes exercised
    for k in ("color", "depth", "transmittance"):
        np.testing.assert_array_equal(
            dense[k][active], culled[k][active], err_msg=f"{k} (active)"
        )
    bg = {"color": 0.0, "depth": r.max_dist, "transmittance": 1.0}
    for k, v in bg.items():
        np.testing.assert_array_equal(
            culled[k][~active], np.full_like(culled[k][~active], v),
            err_msg=f"{k} (culled)",
        )


def test_update_grid_ema_max(tiny_renderer, key):
    """update_grid probes the field on a jittered lattice and EMA-maxes;
    a fresh (all-inf) grid becomes finite after the first update and its
    occupancy tracks the field's density support."""
    import jax
    from neddf_tpu.ops.occupancy import make_grid, update_grid

    r = tiny_renderer
    params = r.init(key)
    grid = make_grid(8, 1.1, threshold=1e-6)
    sched = r.network_fine.schedule(-1)
    g1 = update_grid(grid, r.network_fine, params["network_fine"], sched,
                     jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(g1.values)))
    occ1 = float((g1.values > g1.threshold).mean())
    assert 0.0 <= occ1 <= 1.0
    # exact EMA-max law: same key probes the same jittered lattice, so
    # g2 == max(decay * g1, fresh_probe) where fresh_probe is the raw
    # density probe obtained by updating a fresh grid with that key
    key2 = jax.random.PRNGKey(2)
    g2 = update_grid(g1, r.network_fine, params["network_fine"], sched,
                     key2, decay=0.5)
    fresh = update_grid(make_grid(8, 1.1, 1e-6), r.network_fine,
                        params["network_fine"], sched, key2)
    expected = jnp.maximum(0.5 * g1.values, fresh.values)
    np.testing.assert_allclose(
        np.asarray(g2.values), np.asarray(expected), rtol=1e-6, atol=1e-7
    )
