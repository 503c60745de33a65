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


def umeyama_alignment(
    src: "np.ndarray", dst: "np.ndarray", with_scale: bool = True
) -> Tuple["np.ndarray", "np.ndarray", float]:
    """Least-squares similarity transform aligning point sets (Umeyama 1991).

    Returns (r_g [3,3], t_g [3], s) minimizing ``||s * r_g @ src_i + t_g
    - dst_i||^2``. Used to remove the global SE(3)(+scale) GAUGE freedom
    before measuring camera-pose error in joint field+pose optimization
    (BARF-style evaluation): a jointly trained scene can converge to the
    true geometry expressed in a globally transformed world frame, which
    raw pose comparison misreads as failure.

    Args:
        src: [N, 3] points (estimated camera centers).
        dst: [N, 3] points (true camera centers).
        with_scale: solve for the scale gauge too (else s = 1).
    """
    import numpy as np

    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(axis=0), dst.mean(axis=0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    u, d, vt = np.linalg.svd(cov)
    sgn = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        sgn[2, 2] = -1.0
    r_g = u @ sgn @ vt
    if with_scale:
        var_s = np.square(xs).sum() / src.shape[0]
        s = float((d * np.diag(sgn)).sum() / max(var_s, 1e-30))
    else:
        s = 1.0
    t_g = mu_d - s * r_g @ mu_s
    return r_g, t_g, s


def aligned_pose_error(
    initials: "np.ndarray",
    deltas: "np.ndarray",
    true_initials: "np.ndarray",
    with_scale: bool = True,
) -> float:
    """Gauge-aligned mean pose error (Frobenius on R + L2 on centers).

    Solves the global similarity gauge over CAMERA CENTERS with
    :func:`umeyama_alignment`, applies it to the estimated poses, then
    averages ``||r_g @ R_i - R0_i||_F + ||s * r_g @ T_i + t_g - T0_i||``.
    Use the SAME function on the before/after pose sets so both sides
    get the gauge removal.
    """
    import numpy as np

    n = initials.shape[0]
    rs, ts, r0s, t0s = [], [], [], []
    for i in range(n):
        r, t = camera_pose(initials[i], deltas[i])
        r0, t0 = camera_pose(true_initials[i], jnp.zeros(6, jnp.float32))
        rs.append(np.asarray(r)); ts.append(np.asarray(t))
        r0s.append(np.asarray(r0)); t0s.append(np.asarray(t0))
    ts_a, t0s_a = np.stack(ts), np.stack(t0s)
    r_g, t_g, s = umeyama_alignment(ts_a, t0s_a, with_scale)
    err = 0.0
    for i in range(n):
        err += float(
            np.linalg.norm(r_g @ rs[i] - r0s[i])
            + np.linalg.norm(s * r_g @ ts_a[i] + t_g - t0s_a[i])
        )
    return err / n
