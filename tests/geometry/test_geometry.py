import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from neddf_tpu.geometry import (
    PinholeCalib,
    Rays,
    camera_pose,
    create_rays,
    get_sampling_cones,
    get_sampling_points,
    project,
    unproject,
)
from neddf_tpu.geometry.se3 import rodrigues


def test_rodrigues_matches_scipy(rng):
    for _ in range(5):
        w = rng.standard_normal(3).astype(np.float32)
        r, _ = rodrigues(jnp.asarray(w))
        r_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(r, r_ref, rtol=1e-4, atol=1e-5)


def test_rodrigues_zero_is_identity_with_finite_grad():
    r, v = rodrigues(jnp.zeros(3))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-7)
    np.testing.assert_allclose(v, np.eye(3), atol=1e-7)
    g = jax.grad(lambda w: jnp.sum(rodrigues(w)[0]))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_camera_pose_composition(rng):
    init = rng.standard_normal(6).astype(np.float32)
    r, t = camera_pose(jnp.asarray(init), jnp.zeros(6))
    np.testing.assert_allclose(r, Rotation.from_rotvec(init[:3]).as_matrix(), atol=1e-5)
    np.testing.assert_allclose(t, init[3:], atol=1e-6)


def test_project_unproject_roundtrip(calib_params, rng):
    """project(unproject(uv)) == uv within 1e-4 px (reference
    tests/camera/test_camera.py:16-20 pattern)."""
    calib = PinholeCalib(calib_params)
    init = np.array([0.1, -0.2, 0.3, 1.0, 2.0, -1.0], dtype=np.float32)
    r, t = camera_pose(jnp.asarray(init), jnp.zeros(6))
    uv = rng.uniform(0, 800, (32, 2)).astype(np.float32)
    pos = unproject(calib, r, t, jnp.asarray(uv))
    uv2 = project(calib, r, t, pos)
    np.testing.assert_allclose(uv2, uv, rtol=1e-3, atol=1e-2)


def test_create_rays_unit_dirs(calib_params):
    calib = PinholeCalib(calib_params)
    r, t = camera_pose(jnp.zeros(6), jnp.zeros(6))
    uv = jnp.array([[0, 0], [400, 400], [799, 799]], dtype=jnp.int32)
    rays = create_rays(calib, r, t, uv)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays.ray_dir), axis=1), 1.0, rtol=1e-5
    )
    # center pixel looks along -z (RUB backward = camera forward -z)
    center_dir = np.asarray(rays.ray_dir[1])
    assert center_dir[2] < -0.99


def test_sampling_points_positions():
    rays = Rays(
        ray_dir=jnp.array([[0.0, 0.0, 1.0]]),
        ray_orig=jnp.array([[1.0, 2.0, 3.0]]),
        uv=jnp.zeros((1, 2), dtype=jnp.int32),
    )
    dists = jnp.array([[1.0, 2.0, 4.0]])
    s = get_sampling_points(rays, dists)
    np.testing.assert_allclose(
        s.sample_pos[0, :, 2], np.array([4.0, 5.0, 7.0]), rtol=1e-6
    )
    np.testing.assert_allclose(s.diag_variance, 0.0)


def test_sampling_cones_moments():
    rays = Rays(
        ray_dir=jnp.array([[0.0, 0.0, 1.0]]),
        ray_orig=jnp.zeros((1, 3)),
        uv=jnp.zeros((1, 2), dtype=jnp.int32),
    )
    dists = jnp.array([[2.0, 3.0, 4.0]])
    s = get_sampling_cones(rays, dists, ray_radius=1e-3)
    # t_mu shifts slightly beyond interval midpoint; variance positive
    assert s.sample_pos[0, 0, 2] > 2.4
    assert (np.asarray(s.diag_variance) >= 0).all()
    # axial variance along dir (z), radial in x/y
    assert s.diag_variance[0, 0, 2] > s.diag_variance[0, 0, 0]


def test_umeyama_alignment_recovers_similarity(rng):
    from neddf_tpu.geometry.se3 import umeyama_alignment

    src = rng.normal(size=(8, 3))
    r_true, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(r_true) < 0:
        r_true[:, 2] *= -1.0
    s_true, t_true = 1.7, np.array([0.3, -1.2, 0.5])
    dst = s_true * src @ r_true.T + t_true
    r_g, t_g, s_g = umeyama_alignment(src, dst)
    np.testing.assert_allclose(r_g, r_true, atol=1e-10)
    np.testing.assert_allclose(t_g, t_true, atol=1e-10)
    assert abs(s_g - s_true) < 1e-10


def test_aligned_pose_error_removes_global_gauge(rng):
    """A camera set moved rigidly as a whole (the joint-optimization
    gauge mode) has ~zero ALIGNED error while the raw error is large;
    per-camera noise survives alignment."""
    from neddf_tpu.geometry.se3 import aligned_pose_error, camera_pose, rodrigues

    n = 6
    clean = rng.normal(scale=0.5, size=(n, 6)).astype(np.float32)
    # apply one global rotation+translation to every camera pose:
    # R_i' = Rg R_i, T_i' = Rg T_i + tg  ->  recompose as rotvec+trans
    from scipy.spatial.transform import Rotation

    rg = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix().astype(np.float32)
    tg = np.array([0.4, 0.1, -0.2], np.float32)
    moved = np.zeros_like(clean)
    for i in range(n):
        r_i, t_i = camera_pose(clean[i], np.zeros(6, np.float32))
        moved[i, :3] = Rotation.from_matrix(rg @ np.asarray(r_i)).as_rotvec()
        moved[i, 3:] = rg @ np.asarray(t_i) + tg
    zeros = np.zeros_like(clean)
    err_gauge = aligned_pose_error(moved, zeros, clean)
    assert err_gauge < 1e-5

    noisy = moved + rng.normal(scale=0.05, size=moved.shape).astype(np.float32)
    err_noise = aligned_pose_error(noisy, zeros, clean)
    assert err_noise > 0.01
