"""Pinhole camera model and ray generation (pure functions over pytrees).

Re-design of neddf/camera/{camera.py, pinhole_calib.py}: the reference's
stateful nn.Modules (one Camera per frame, update_transform side effect)
become a batched pose array plus pure functions; all frames live in one
[N, 6] tensor so per-step camera selection is a device-side gather and
pose refinement is just another parameter leaf.

Axis conventions preserved from the reference: world/camera frames are
Right-Up-Back; projection flips to Right-Down-Front via diag(1,-1,-1)
(pinhole_calib.py:37-49), unprojected directions are L2-normalised
(pinhole_calib.py:73), and pixel centers sit at +0.5 (camera.py:173-187).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neddf_tpu.geometry.rays import Rays

Array = jax.Array

_RUB2RDF = jnp.array([1.0, -1.0, -1.0])  # diagonal of the axis flip


class PinholeCalib(NamedTuple):
    """Intrinsics [fx, fy, cx, cy] as a pytree leaf (trainable in principle,
    like the reference's nn.Parameter at base_camera_calib)."""

    params: Array  # [4]

    @property
    def fx(self) -> Array:
        return self.params[0]

    @property
    def fy(self) -> Array:
        return self.params[1]

    @property
    def cx(self) -> Array:
        return self.params[2]

    @property
    def cy(self) -> Array:
        return self.params[3]


def project_local(calib: PinholeCalib, xyz: Array) -> Array:
    """[B, 3] camera-frame (RUB) points -> [B, 2] pixel uv."""
    xyz_rdf = xyz * _RUB2RDF[None, :]
    zi = 1.0 / xyz_rdf[:, 2]
    u = calib.fx * xyz_rdf[:, 0] * zi + calib.cx
    v = calib.fy * xyz_rdf[:, 1] * zi + calib.cy
    return jnp.stack([u, v], axis=1)


def unproject_local(calib: PinholeCalib, uv: Array) -> Array:
    """[B, 2] pixel uv -> [B, 3] unit direction in camera frame (RUB)."""
    x = (uv[:, 0] - calib.cx) / calib.fx
    y = (uv[:, 1] - calib.cy) / calib.fy
    xyz_rdf = jnp.stack([x, y, jnp.ones_like(x)], axis=1)
    xyz_rub = xyz_rdf * _RUB2RDF[None, :]
    return xyz_rub / jnp.linalg.norm(xyz_rub, axis=1, keepdims=True)


def project(calib: PinholeCalib, r: Array, t: Array, pos_world: Array) -> Array:
    """World [B, 3] -> pixel [B, 2] through pose (R, T)."""
    pos_camera = (pos_world - t[None, :]) @ r  # == (R^T (p - T))^T
    return project_local(calib, pos_camera)


def unproject(calib: PinholeCalib, r: Array, t: Array, uv: Array) -> Array:
    """Pixel [B, 2] -> world [B, 3] unit-depth points through pose (R, T)."""
    pos_camera = unproject_local(calib, uv)
    return pos_camera @ r.T + t[None, :]


def pixel_centers(pixel_id: Array, scale: float = 1.0) -> Array:
    """Integer pixel ids -> continuous pixel-center coordinates (+0.5)."""
    return 0.5 + scale * pixel_id.astype(jnp.float32)


def create_rays(calib: PinholeCalib, r: Array, t: Array, uv: Array) -> Rays:
    """Generate rays through the given integer pixel positions.

    Matches Camera.create_rays (camera.py:155-171): pixel centers are
    unprojected to unit camera-frame dirs, rotated to world, origin = T.
    """
    batch_size = uv.shape[0]
    uv_center = pixel_centers(uv)
    dir_camera = unproject_local(calib, uv_center)
    ray_dir = dir_camera @ r.T
    ray_orig = jnp.broadcast_to(t[None, :], (batch_size, 3))
    return Rays(ray_dir=ray_dir, ray_orig=ray_orig, uv=uv)


def ndc_rays(calib: PinholeCalib, near: "Array | float", rays: Rays) -> Rays:
    """Warp world-space rays to NDC for forward-facing captures.

    The standard NeRF NDC parameterization (NeRF paper appendix C; the
    reference has no LLFF/NDC path at all): ray origins are first slid
    to the z = -near plane, then origin/direction are mapped so that
    pos(t') = o' + t' d' for t' in [0, 1) sweeps the ray from the near
    plane to infinity with sampling uniform in DISPARITY — the right
    density for unbounded forward-facing content.

    Assumes the WORLD frame is the recentered capture frame (average
    camera at the origin looking along -z, i.e. RUB "back" = +z) —
    LLFFDataset(recenter=True) provides this. Screen scales come from
    the intrinsics: the NDC x span [-1, 1] covers W = 2*cx pixels.
    """
    o, d = rays.ray_orig, rays.ray_dir
    # slide origins onto the near plane (z = -near)
    t_near = -(near + o[:, 2]) / d[:, 2]
    o = o + t_near[:, None] * d
    ax = -calib.fx / calib.cx  # == -f / (W/2)
    ay = -calib.fy / calib.cy
    o_z = o[:, 2]
    o_ndc = jnp.stack(
        [ax * o[:, 0] / o_z, ay * o[:, 1] / o_z, 1.0 + 2.0 * near / o_z],
        axis=1,
    )
    d_ndc = jnp.stack(
        [
            ax * (d[:, 0] / d[:, 2] - o[:, 0] / o_z),
            ay * (d[:, 1] / d[:, 2] - o[:, 1] / o_z),
            -2.0 * near / o_z,
        ],
        axis=1,
    )
    return Rays(ray_dir=d_ndc, ray_orig=o_ndc, uv=rays.uv)
