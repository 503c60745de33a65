"""NDC ray parameterization tests (forward-facing / LLFF captures).

The reference has no LLFF or NDC path at all (SURVEY.md §2); this is
superset capability following the standard NeRF NDC construction
(paper appendix C). Pinned properties:

* the warp is EXACT: any world point on a ray (in front of the near
  plane) maps to o_ndc + t' * d_ndc with the projective formulas, and
  t' sweeps [0, 1) from the near plane to infinity;
* the warp is invariant to the input direction's scale;
* the renderer under ndc=true shades with unit WORLD directions and
  composites in the [0, 1] NDC window;
* LLFFDataset(recenter=True) produces the average-camera frame the
  warp assumes (mean position ~0, mean view direction ~ -z) without
  changing relative geometry.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.geometry import PinholeCalib, camera_pose
from neddf_tpu.geometry.camera import create_rays, ndc_rays
from tests.render.test_renderer import SMALL_NERF, _make_renderer

NEAR = 1.0


@pytest.fixture(scope="module")
def ff_camera():
    """Forward-facing rig: camera near the origin looking along -z."""
    calib = PinholeCalib(jnp.array([120.0, 120.0, 64.0, 48.0], jnp.float32))
    init = jnp.array([0.0, 0.0, 0.0, 0.1, -0.05, 0.2], jnp.float32)
    r, t = camera_pose(init, jnp.zeros(6))
    return calib, r, t


def _grid_uv(n=5, w=128, h=96):
    u = np.linspace(4, w - 4, n).astype(np.int32)
    v = np.linspace(4, h - 4, n).astype(np.int32)
    uu, vv = np.meshgrid(u, v)
    return jnp.asarray(np.stack([uu.ravel(), vv.ravel()], axis=1))


def test_ndc_warp_is_exact_projective_map(ff_camera):
    """o_ndc + t'·d_ndc reproduces the direct projection of o + t·d."""
    calib, r, t = ff_camera
    rays = create_rays(calib, r, t, _grid_uv())
    ndc = ndc_rays(calib, NEAR, rays)
    o, d = np.asarray(rays.ray_orig), np.asarray(rays.ray_dir)
    fx, fy, cx, cy = np.asarray(calib.params, np.float64)

    for t_world in [1.8, 3.0, 10.0, 300.0]:
        p = o + t_world * d
        assert (p[:, 2] < -NEAR + 1e-6).all(), "test points behind near plane"
        # direct NDC projection of the world point
        x_ndc = -(fx / cx) * p[:, 0] / p[:, 2]
        y_ndc = -(fy / cy) * p[:, 1] / p[:, 2]
        z_ndc = 1.0 + 2.0 * NEAR / p[:, 2]
        # the same point via the warped ray: solve t' from z
        o_n, d_n = np.asarray(ndc.ray_orig), np.asarray(ndc.ray_dir)
        t_prime = (z_ndc - o_n[:, 2]) / d_n[:, 2]
        q = o_n + t_prime[:, None] * d_n
        np.testing.assert_allclose(q[:, 0], x_ndc, atol=2e-4)
        np.testing.assert_allclose(q[:, 1], y_ndc, atol=2e-4)
        assert (t_prime > -1e-5).all() and (t_prime < 1.0).all()


def test_ndc_tprime_zero_is_near_plane_and_one_is_infinity(ff_camera):
    calib, r, t = ff_camera
    rays = create_rays(calib, r, t, _grid_uv())
    ndc = ndc_rays(calib, NEAR, rays)
    o_n, d_n = np.asarray(ndc.ray_orig), np.asarray(ndc.ray_dir)
    # t'=0: on the near plane, z_ndc = 1 - 2 = -1
    np.testing.assert_allclose(o_n[:, 2], -1.0, atol=1e-5)
    # t'->1: z_ndc -> 1 (infinity); d_z = 2*near/|o_z| with o_z = -near
    np.testing.assert_allclose(o_n[:, 2] + d_n[:, 2], 1.0, atol=1e-5)


def test_ndc_warp_scale_invariant(ff_camera):
    """Direction scaling must not change the warped ray."""
    calib, r, t = ff_camera
    rays = create_rays(calib, r, t, _grid_uv())
    scaled = rays._replace(ray_dir=2.5 * rays.ray_dir)
    a = ndc_rays(calib, NEAR, rays)
    b = ndc_rays(calib, NEAR, scaled)
    np.testing.assert_allclose(
        np.asarray(a.ray_orig), np.asarray(b.ray_orig), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.ray_dir), np.asarray(b.ray_dir), atol=1e-5
    )


def test_renderer_ndc_window_and_world_shading(ff_camera, key):
    renderer = _make_renderer(SMALL_NERF, ndc=True, ndc_near=NEAR)
    # the ndc flag pins the compositing window to [0, 1]
    assert renderer.dist_near == 0.0
    assert renderer.dist_far == 1.0
    assert renderer.max_dist == 1.0
    params = renderer.init(key)
    calib, r, t = ff_camera
    out = renderer.render_rays(params, calib, r, t, _grid_uv(3), key, 0)
    color = np.asarray(out["color"])
    depth = np.asarray(out["depth"])
    assert np.isfinite(color).all()
    assert (depth >= 0.0).all() and (depth <= 1.0 + 1e-5).all()


def test_renderer_ndc_shading_dirs_are_world_units(ff_camera, key):
    """The field must see unit world dirs, not warped NDC dirs."""
    renderer = _make_renderer(SMALL_NERF, ndc=True, ndc_near=NEAR)
    calib, r, t = ff_camera
    rays = create_rays(calib, r, t, _grid_uv(3))
    dists = jnp.linspace(0.0, 1.0, 9)[None, :].repeat(rays.uv.shape[0], 0)
    sampling = renderer._make_sampling(
        ndc_rays(calib, NEAR, rays), dists, shade_dir=rays.ray_dir
    )
    dirs = np.asarray(sampling.sample_dir)
    np.testing.assert_allclose(
        np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        dirs, np.asarray(rays.ray_dir)[:, None, :].repeat(9, 1), atol=1e-6
    )
    # positions live in the NDC cube
    pos = np.asarray(sampling.sample_pos)
    assert np.isfinite(pos).all()
    assert (np.abs(pos[..., 2]) <= 1.0 + 1e-5).all()


def test_renderer_ndc_rejects_cone_and_accel(key):
    with pytest.raises(ValueError, match="sampling_type"):
        _make_renderer(SMALL_NERF, ndc=True, sampling_type="cone")
    renderer = _make_renderer(SMALL_NERF, ndc=True)
    with pytest.raises(ValueError, match="occupancy"):
        renderer.render_rays_accel(None, None, None, None, None, None, None)


def test_llff_recenter_produces_average_camera_frame(tmp_path):
    from neddf_tpu.data.llff import (
        LLFFDataset,
        generate_forward_facing_dataset,
    )

    scene = generate_forward_facing_dataset(
        tmp_path / "scene", n_images=8, image_size=32
    )
    # recentering averages over ALL cameras: combine both splits
    ds = LLFFDataset(str(scene), "train", factor=1, recenter=True)
    ds_t = LLFFDataset(str(scene), "test", factor=1, recenter=True)
    cams = np.concatenate([ds.camera_params, ds_t.camera_params], 0)
    rotvecs = cams[:, :3]
    trans = cams[:, 3:]
    from scipy.spatial.transform import Rotation

    backs = Rotation.from_rotvec(rotvecs).as_matrix()[:, :, 2]
    b_avg = backs.mean(0) / np.linalg.norm(backs.mean(0))
    # average view direction is -z <=> average back column is +z
    np.testing.assert_allclose(b_avg, [0.0, 0.0, 1.0], atol=1e-5)
    # mean camera position at the origin (scaled world units)
    t_avg = trans.mean(0)
    assert np.abs(t_avg).max() < 1e-4 * max(1.0, np.abs(trans).max())

    # relative geometry unchanged: pairwise camera distances match the
    # non-recentered load (rigid transform + identical scale)
    ds0 = LLFFDataset(str(scene), "train", factor=1, recenter=False)
    t1 = ds.camera_params[:, 3:]
    d_rec = np.linalg.norm(t1[:, None] - t1[None], axis=-1)
    t0 = ds0.camera_params[:, 3:]
    d_raw = np.linalg.norm(t0[:, None] - t0[None], axis=-1)
    np.testing.assert_allclose(d_rec, d_raw, rtol=1e-5, atol=1e-6)
