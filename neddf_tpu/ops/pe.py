"""Positional encoding with lowpass window, grad equaliser and mip weights.

Matches the reference math exactly:

* frequencies are ``2**t`` WITHOUT the pi factor — a deliberate reference
  choice (neddf/nn_module/positional_encoding.py:33-35).
* channel layout: for input dim 3 and rank R the phase tensor is
  ``p[n, t*3 + i] = freq[t] * x[n, i]`` and the encoding is
  ``concat([scale*sin(p), scale*cos(p)], axis=-1)`` -> ``[N, 6R]``
  (positional_encoding.py:37-65).
* lowpass (coarse-to-fine) window: cosine ramp on band ``k = floor(alpha)``,
  1e-7 above, all-ones once ``alpha >= R``
  (positional_encoding.py:67-87) — implemented branchlessly so ``alpha``
  can be a traced scalar inside jit.
* grad scale ``1 / (0.5 * freq)`` equalises Jacobian magnitudes across
  bands (with_grad/positional_encoding.py:119-135).
* mip-NeRF integrated-PE attenuation ``exp(-0.5 * freq^2 * diag_var)``
  (neddf/ray/sampling.py:44-71).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def pe_frequencies(rank: int, dtype: "jnp.dtype" = jnp.float32) -> Array:
    """[rank] frequencies 2**t (no pi factor, by reference design)."""
    return 2.0 ** jnp.arange(rank, dtype=dtype)


def pe_lowpass_scale(rank: int, alpha: "Array | float", input_dim: int = 3) -> Array:
    """Coarse-to-fine frequency window, branchless over traced ``alpha``.

    Returns [1, rank*input_dim] in the (t, i) channel layout. Equals the
    reference's get_lowpass_scale for every float alpha: bands below
    floor(alpha) pass, band floor(alpha) gets the cosine ramp + 1e-7,
    bands above get 1e-7; alpha >= rank yields all-ones.
    """
    alpha = jnp.asarray(alpha, dtype=jnp.float32)
    t = jnp.arange(rank, dtype=jnp.float32)
    k = jnp.floor(alpha)
    ramp = 0.5 * (1.0 - jnp.cos(jnp.pi * (alpha - k))) + 1e-7
    scale = jnp.where(t < k, 1.0, jnp.where(t == k, ramp, 1e-7))
    scale = jnp.where(alpha >= rank, jnp.ones_like(scale), scale)
    return jnp.repeat(scale, input_dim)[None, :]


def pe_grad_scale(rank: int, input_dim: int = 3) -> Array:
    """[1, rank*input_dim] Jacobian-equalising scale 1/(0.5*freq)."""
    return jnp.repeat(1.0 / (0.5 * pe_frequencies(rank)), input_dim)[None, :]


def pe_weights(diag_variance: Array, rank: int) -> Array:
    """Integrated-PE attenuation from sampling covariance diagonal.

    Args:
        diag_variance: [..., 3] covariance diagonal per sample.
        rank: PE rank R.

    Returns:
        [..., R*3] weights exp(-0.5 * freq_t^2 * var_i) in (t, i) layout.
    """
    d = diag_variance.shape[-1]
    # (t, i) channel layout built by TILE-multiply, not an [..., R, 3]
    # intermediate + reshape: the rank-3 reshape pattern lowers worse on
    # TPU; the tile is a broadcast-gather XLA fuses into the consumer.
    # Values are bitwise identical (one multiply per element either
    # way). freq factor broadcast preserves leading dims (1-D in ->
    # 1-D out, per the shape contract above).
    fsq_rep = jnp.repeat(jnp.square(pe_frequencies(rank)), d)
    fsq_rep = fsq_rep.reshape((1,) * (diag_variance.ndim - 1) + (rank * d,))
    reps = (1,) * (diag_variance.ndim - 1) + (rank,)
    return jnp.exp(-0.5 * fsq_rep * jnp.tile(diag_variance, reps))


def positional_encoding(
    x: Array, rank: int, scale: Optional[Array] = None
) -> Array:
    """gamma(x) = [scale*sin(2^t x_i), scale*cos(2^t x_i)] -> [..., 6R].

    ``scale`` broadcasts against the [..., R*3] phase tensor (pass e.g.
    lowpass*pe_weights products).
    """
    input_dim = x.shape[-1]
    freq = pe_frequencies(rank, dtype=x.dtype)
    # tile-multiply, not [.., R, 3]-reshape — see pe_weights layout note
    freq_rep = jnp.repeat(freq, input_dim).reshape(
        (1,) * (x.ndim - 1) + (rank * input_dim,)
    )
    p = freq_rep * jnp.tile(x, (1,) * (x.ndim - 1) + (rank,))
    if scale is not None:
        p_sin = scale * jnp.sin(p)
        p_cos = scale * jnp.cos(p)
    else:
        p_sin, p_cos = jnp.sin(p), jnp.cos(p)
    return jnp.concatenate([p_sin, p_cos], axis=-1)
