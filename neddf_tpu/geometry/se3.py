"""SE(3) pose math: branchless Rodrigues transform.

Re-design of the reference Camera.update_transform
(neddf/camera/camera.py:66-118): pose = initial rotvec/translation
composed with a trainable 6-DoF delta. The reference's Python
``if theta > 1e-10`` branch becomes a jnp.where select with the standard
safe-input pattern so the function is jit-compilable AND has finite
gradients at delta == 0 (the common case — deltas start at zero and are
only moved by pose refinement).

Note: the reference's V matrix uses (1-c)/theta^2 and (theta-s)/theta^3
coefficients on the *unit-axis* skew w (camera.py:105-109) — that differs
from the textbook SE(3) left Jacobian by a factor 1/theta. We replicate
the reference exactly for parity; it only affects pose-refinement
dynamics, not fixed-pose rendering.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def skew(v: Array) -> Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(w_vec: Array) -> Tuple[Array, Array]:
    """Rotation R and the reference's V matrix from a rotation vector.

    Returns (R [3,3], V [3,3]) for w_vec [3]; both finite (identity-like)
    and smooth at w_vec == 0.
    """
    eye = jnp.eye(3, dtype=w_vec.dtype)
    theta_sq = jnp.sum(jnp.square(w_vec))
    small = theta_sq < 1e-20  # matches the reference's theta > 1e-10 gate
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))  # safe sqrt

    n = w_vec / theta
    w_unit = skew(n)
    ww = w_unit @ w_unit
    c, s = jnp.cos(theta), jnp.sin(theta)
    theta_inv = 1.0 / theta
    r_big = eye + s * w_unit + (1.0 - c) * ww
    v_big = (
        eye
        + (1.0 - c) * theta_inv * theta_inv * w_unit
        + (theta - s) * theta_inv * theta_inv * theta_inv * ww
    )

    w_full = skew(w_vec)
    r_small = eye + w_full
    v_small = r_small

    r = jnp.where(small, r_small, r_big)
    v = jnp.where(small, v_small, v_big)
    return r, v


def camera_pose(initial_param: Array, delta_param: Array) -> Tuple[Array, Array]:
    """World-from-camera (R, T) from initial rotvec+trans and trainable delta.

    Matches Camera.update_transform: R = Ri @ R0; T = Vi @ dt + Ri @ T0,
    where (Ri, Vi) come from the delta rotvec and (R0, T0) from the
    initial parameters.

    Args:
        initial_param: [6] = [rotvec(3), translation(3)] from the dataset.
        delta_param: [6] trainable pose-refinement offsets (zeros default).

    Returns:
        (R [3,3], T [3]).
    """
    r0, _ = rodrigues(initial_param[:3])
    t0 = initial_param[3:6]
    ri, vi = rodrigues(delta_param[:3])
    r = ri @ r0
    t = vi @ delta_param[3:6] + ri @ t0
    return r, t
