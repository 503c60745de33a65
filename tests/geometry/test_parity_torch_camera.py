"""Geometry-layer parity against the PyTorch reference: camera rays
(SE(3) pose composition + RUB<->RDF pinhole conventions + the +0.5
pixel centers), project/unproject round trips, and the mip-NeRF cone
moments — all deterministic, compared DIRECTLY on the same inputs
against /root/reference/neddf/{camera,ray}. The 42 dB render parity
implies these; this pins each one in isolation so a regression names
the exact convention it broke.
"""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.geometry import PinholeCalib
from neddf_tpu.geometry.camera import create_rays, project, unproject
from neddf_tpu.geometry.rays import get_sampling_cones, get_sampling_points
from neddf_tpu.geometry.se3 import camera_pose
from neddf_tpu.ops.pe import pe_weights

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "neddf")),
    reason="reference repo not mounted",
)

CALIB = np.array([694.4, 660.0, 250.0, 245.0], np.float32)
POSE = np.array([0.3, -0.2, 0.5, 0.1, -0.4, 3.5], np.float32)
DELTA = np.array([0.01, -0.02, 0.005, 0.03, 0.01, -0.04], np.float32)


@pytest.fixture(scope="module")
def torch_camera():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from neddf.camera import Camera, PinholeCalib as TorchCalib

    calib = TorchCalib(CALIB.copy())
    cam = Camera(calib, POSE.copy())
    with torch.no_grad():
        cam.params += torch.from_numpy(DELTA.copy())
    cam.update_transform()
    return cam


@pytest.fixture(scope="module")
def ours():
    calib = PinholeCalib(jnp.asarray(CALIB))
    r, t = camera_pose(jnp.asarray(POSE), jnp.asarray(DELTA))
    return calib, r, t


def test_create_rays_matches_reference(torch_camera, ours):
    import torch

    calib, r, t = ours
    rng = np.random.default_rng(23)
    uv = rng.integers(0, 500, (32, 2)).astype(np.int64)

    ref_rays = torch_camera.create_rays(torch.from_numpy(uv))
    got = create_rays(calib, r, t, jnp.asarray(uv.astype(np.int32)))
    np.testing.assert_allclose(
        np.asarray(got.ray_orig), ref_rays.ray_orig.detach().numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.ray_dir), ref_rays.ray_dir.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_project_unproject_match_reference(torch_camera, ours):
    import torch

    calib, r, t = ours
    rng = np.random.default_rng(29)
    pos_world = rng.standard_normal((16, 3)).astype(np.float32)

    ref_uv = torch_camera.project(torch.from_numpy(pos_world))
    got_uv = project(calib, r, t, jnp.asarray(pos_world))
    np.testing.assert_allclose(
        np.asarray(got_uv), ref_uv.detach().numpy(), rtol=1e-4, atol=1e-3
    )

    uv = rng.uniform(0, 500, (16, 2)).astype(np.float32)
    ref_dir = torch_camera.unproject(torch.from_numpy(uv))
    got_dir = unproject(calib, r, t, jnp.asarray(uv))
    np.testing.assert_allclose(
        np.asarray(got_dir), ref_dir.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_sampling_points_and_cones_match_reference(torch_camera, ours):
    import torch

    calib, r, t = ours
    rng = np.random.default_rng(31)
    uv = rng.integers(0, 500, (8, 2)).astype(np.int64)
    dists = np.sort(
        rng.uniform(0.5, 5.0, (8, 12)).astype(np.float32), axis=1
    )

    ref_rays = torch_camera.create_rays(torch.from_numpy(uv))
    got_rays = create_rays(calib, r, t, jnp.asarray(uv.astype(np.int32)))

    ref_pts = ref_rays.get_sampling_points(torch.from_numpy(dists))
    got_pts = get_sampling_points(got_rays, jnp.asarray(dists))
    np.testing.assert_allclose(
        np.asarray(got_pts.sample_pos),
        ref_pts.sample_pos.detach().numpy(), rtol=1e-5, atol=1e-5,
    )

    ref_cone = ref_rays.get_sampling_cones(torch.from_numpy(dists))
    got_cone = get_sampling_cones(got_rays, jnp.asarray(dists))
    for name, a, b in (
        ("pos", got_cone.sample_pos, ref_cone.sample_pos),
        ("dir", got_cone.sample_dir, ref_cone.sample_dir),
        ("var", got_cone.diag_variance, ref_cone.diag_variance),
    ):
        np.testing.assert_allclose(
            np.asarray(a), b.detach().numpy(), rtol=1e-4, atol=1e-6,
            err_msg=name,
        )

    # Sampling.get_pe_weights (mip integrated-PE attenuation)
    rank = 6
    ref_w = ref_cone.get_pe_weights(
        torch.from_numpy(2.0 ** np.arange(rank, dtype=np.float32))
    )
    got_w = pe_weights(got_cone.diag_variance, rank)
    np.testing.assert_allclose(
        np.asarray(got_w).reshape(ref_w.shape), ref_w.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )
