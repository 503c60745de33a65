"""Ray and Sampling pytrees + point/cone sample generation.

Re-design of neddf/ray/{ray.py, sampling.py}: the classes become
NamedTuple pytrees so they flow through jit/vmap/shard_map unchanged.
``Sampling`` is the universal data packet handed from the renderer to
the neural fields (as in the reference's layer map).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Rays(NamedTuple):
    """A batch of rays: direction, origin, and source pixel coords."""

    ray_dir: Array  # [B, 3]
    ray_orig: Array  # [B, 3]
    uv: Array  # [B, 2]


class Sampling(NamedTuple):
    """Sample points along rays with mip-style covariance diagonal.

    diag_variance is zero for point sampling; cone sampling fills the
    conical-frustum moments (used by pe_weights for integrated PE).
    """

    sample_pos: Array  # [B, S, 3]
    sample_dir: Array  # [B, S, 3]
    diag_variance: Array  # [B, S, 3]


def get_sampling_points(rays: Rays, dists: Array) -> Sampling:
    """Point samples pos = o + d * t with zero variance
    (reference: neddf/ray/ray.py:88-126)."""
    sample_dir = jnp.broadcast_to(
        rays.ray_dir[:, None, :], (*dists.shape, 3)
    )
    sample_pos = rays.ray_orig[:, None, :] + rays.ray_dir[:, None, :] * dists[..., None]
    return Sampling(
        sample_pos=sample_pos,
        sample_dir=sample_dir,
        diag_variance=jnp.zeros_like(sample_pos),
    )


def get_sampling_cones(rays: Rays, dists: Array, ray_radius: float = 1e-3) -> Sampling:
    """mip-NeRF cone casting: conical-frustum mean and diagonal covariance.

    Matches neddf/ray/ray.py:128-194: per interval [d_i, d_{i+1}] (the
    last interval is extrapolated), with t_var along the axis and r_var
    radially, combined via the direction outer-product diagonal.
    """
    dists_near = dists
    dists_far = jnp.concatenate(
        [dists[:, 1:], 2.0 * dists[:, -1:] - dists[:, -2:-1]], axis=-1
    )
    d_mu = 0.5 * (dists_near + dists_far)
    d_sigma = 0.5 * (dists_far - dists_near)
    d_mu2 = jnp.square(d_mu)
    d_sigma2 = jnp.square(d_sigma)
    d_sigma4 = jnp.square(d_sigma2)

    m_inv = 1.0 / (3.0 * d_mu2 + d_sigma2 + 1e-7)
    t_mu = d_mu + (2.0 * d_mu * d_sigma2) * m_inv
    t_var = (1.0 / 3.0) * d_sigma2 - (4.0 / 15.0) * d_sigma4 * (
        12.0 * d_mu2 - d_sigma2
    ) * jnp.square(m_inv)
    r_var = (ray_radius * ray_radius) * (
        (1.0 / 4.0) * d_mu2
        + (5.0 / 12.0) * d_sigma2
        - (4.0 / 15.0) * d_sigma4 * m_inv
    )

    sample_dir = jnp.broadcast_to(rays.ray_dir[:, None, :], (*dists.shape, 3))
    dir_sq = jnp.square(sample_dir)
    diag_variance = t_var[..., None] * dir_sq + r_var[..., None] * (1.0 - dir_sq)
    sample_pos = rays.ray_orig[:, None, :] + rays.ray_dir[:, None, :] * t_mu[..., None]
    return Sampling(
        sample_pos=sample_pos,
        sample_dir=sample_dir,
        diag_variance=diag_variance,
    )
