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
    if _PE_PACKED[0] and diag_variance.ndim == 2:
        # lane-packed exp (see the "packed" section below): bitwise-equal
        # values at ~full VPU lane utilisation + one relayout copy
        n = diag_variance.shape[0]
        p = max(1, 128 // (rank * d))
        if p > 1 and n >= p:
            fsq = jnp.repeat(jnp.square(pe_frequencies(rank)), p * d)[None, :]
            w = jnp.exp(
                -0.5 * fsq * jnp.tile(_pack_rows(diag_variance, p), (1, rank))
            )
            return _unpack_rows(w, rank, p, d, n)
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


# ------------------------------------------------------------------ packed
# Lane-packed PE: the straightforward [N, R*3] phase/exp/sin/cos chain
# occupies only R*3 of a TPU vreg's 128 lanes (23% at rank 10) — the
# profiler shows it as ~0.9 ms of multiply_convert/sine_convert glue per
# NeRF train step (17% of device time). Packing P = 128 // (R*3)
# consecutive samples into one row runs the same elementwise ops at
# 94-98% lane utilisation; one cheap relayout copy restores per-sample
# rows for the MLP. Element VALUES are bitwise identical (same products,
# same sin calls, same multiply order) — pinned by tests/ops/test_pe.py.

#: trace-time toggle for A/Bs (same semantics as kernels' flags: build
#: fresh jitted callables inside each scope)
_PE_PACKED = [True]


class pe_packed:
    """Context manager toggling lane-packed PE (for A/B measurements)."""

    def __init__(self, on: bool):
        self.on = on

    def __enter__(self) -> None:
        self.prev = _PE_PACKED[0]
        _PE_PACKED[0] = self.on

    def __exit__(self, *exc) -> None:
        _PE_PACKED[0] = self.prev


def _pack_rows(x: Array, p: int) -> Array:
    """[N, d] -> [ceil(N/p), p*d] grouping p consecutive samples per row."""
    n, d = x.shape
    n_pad = (-n) % p
    if n_pad:
        x = jnp.concatenate([x, jnp.zeros((n_pad, d), x.dtype)], axis=0)
    return x.reshape(-1, p * d)


def _unpack_rows(y: Array, rank: int, p: int, d: int, n: int) -> Array:
    """(t,s,i)-layout [M, rank*p*d] -> per-sample [n, rank*d] (t,i)."""
    m = y.shape[0]
    y = y.reshape(m, rank, p, d).transpose(0, 2, 1, 3).reshape(m * p, rank * d)
    return y[:n]


def positional_encoding_mip(
    x: Array,
    rank: int,
    var: Optional[Array] = None,
    chan_scale: Optional[Array] = None,
) -> Array:
    """PE with optional mip attenuation, computed lane-packed.

    Equals ``positional_encoding(x, rank, chan_scale * pe_weights(var,
    rank))`` bitwise, but runs the whole [N, R*d] elementwise chain
    (phase multiply, exp, sin, cos, scales) with P samples packed per
    row so the VPU lanes are ~full instead of ~23% occupied.

    Args:
        x: [N, d] positions or directions.
        rank: PE rank R.
        var: optional [N, d] covariance diagonal — applies the
            integrated-PE attenuation exp(-0.5 freq^2 var) per sample.
        chan_scale: optional [1, R*d] per-channel scale in (t, i)
            layout (lowpass window, grad-equaliser products).
    """
    n, d = x.shape
    p = max(1, 128 // (rank * d))
    if not _PE_PACKED[0] or p == 1 or n < p:
        scale: Optional[Array] = chan_scale
        if var is not None:
            w = pe_weights(var, rank)
            scale = w if scale is None else scale * w
        return positional_encoding(x, rank, scale)

    freq = pe_frequencies(rank, dtype=x.dtype)
    freq_rep = jnp.repeat(freq, p * d)[None, :]
    xp = _pack_rows(x, p)
    ph = freq_rep * jnp.tile(xp, (1, rank))

    s: Optional[Array] = None
    if chan_scale is not None:
        # [1, R*d] (t,i) -> [1, R*p*d] (t,s,i): repeat each band's d
        # channels across the p packed samples
        s = jnp.tile(
            chan_scale.reshape(rank, 1, d), (1, p, 1)
        ).reshape(1, rank * p * d)
    if var is not None:
        fsq_rep = jnp.repeat(jnp.square(pe_frequencies(rank)), p * d)[None, :]
        w = jnp.exp(-0.5 * fsq_rep * jnp.tile(_pack_rows(var, p), (1, rank)))
        s = w if s is None else s * w

    if s is not None:
        p_sin, p_cos = s * jnp.sin(ph), s * jnp.cos(ph)
    else:
        p_sin, p_cos = jnp.sin(ph), jnp.cos(ph)
    return jnp.concatenate(
        [_unpack_rows(p_sin, rank, p, d, n), _unpack_rows(p_cos, rank, p, d, n)],
        axis=-1,
    )
