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
        # values at ~full VPU lane utilisation, reshape-only relayout
        n = diag_variance.shape[0]
        p = max(1, 128 // (rank * d))
        if p > 1 and n >= p:
            fsq = _freq_pattern_sti(rank, p, d, square=True)
            vp = _rep_bands(_pack_rows(diag_variance, p), rank, p, d)
            return _unpack_rows(jnp.exp(-0.5 * fsq * vp), rank, p, d, n)
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
# Lane-packed PE — MEASURED NEGATIVE, default OFF. The [N, R*3]
# phase/exp/sin/cos chain occupies only R*3 of a TPU vreg's 128 lanes
# (23% at rank 10) and profiles as ~0.9 ms of multiply_convert/
# sine_convert glue per NeRF train step. Packing P = 128 // (R*3)
# samples per row runs the same elementwise ops at ~94-98% lane
# utilisation — but LOSES on v5e in BOTH possible row layouts
# (same-session A/Bs 2026-08-19, tools/ab_flagship.py, identical loss):
#
#   band-major (t,s,i), transpose unpack:  NeDDF 26.1 vs 19.5 ms/step,
#                                          NeRF   9.65 vs 6.66 ms/step
#   sample-major (s,t,i), reshape unpack:  NeDDF 27.8 vs 19.4 ms/step
#
# Mechanism: on TPU ANY reshape that changes the minor (lane) dimension
# is a physical (8,128)-tile relayout — [M, P*R*d] and [N, R*d] have
# different padded physical bytes, so even the "pure view" unpack costs
# a full copy of the tensor. The MLP kernels fix the narrow per-sample
# [N, R*d] interface, so a packed chain always pays pack+unpack retiles
# that exceed the ~0.9 ms lane saving. Together with round 3's
# "in-kernel PE expansion loses 1.1-2 ms" this pins the PE glue as
# layout-bound, not VPU-lane-bound: the unpacked XLA fusion is the
# right design. Kept behind the toggle (bitwise-equal, tested) for
# re-measurement on future hardware/toolchains.

#: trace-time toggle for A/Bs (same semantics as kernels' flags: build
#: fresh jitted callables inside each scope)
_PE_PACKED = [False]


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
    """(s,t,i)-layout [M, p*rank*d] -> per-sample [n, rank*d] (t,i).

    A pure reshape: sample-major packing keeps each sample's rank*d
    channels contiguous, so this is a row-major VIEW, not a relayout.
    """
    m = y.shape[0]
    return y.reshape(m * p, rank * d)[:n]


def _rep_bands(xp: Array, rank: int, p: int, d: int) -> Array:
    """[M, p*d] (s,i) -> [M, p*rank*d] (s,t,i): repeat each packed
    sample's d input channels across the rank frequency bands (a
    broadcast XLA fuses into the consuming multiply)."""
    m = xp.shape[0]
    return jnp.tile(
        xp.reshape(m, p, 1, d), (1, 1, rank, 1)
    ).reshape(m, p * rank * d)


def _freq_pattern_sti(rank: int, p: int, d: int, square: bool = False) -> Array:
    """[1, p*rank*d] (s,t,i) frequency pattern: freq_t (or freq_t^2)."""
    f = pe_frequencies(rank)
    if square:
        f = jnp.square(f)
    return jnp.tile(jnp.repeat(f, d), p)[None, :]


def positional_encoding_mip(
    x: Array,
    rank: int,
    var: Optional[Array] = None,
    chan_scale: Optional[Array] = None,
) -> Array:
    """PE with optional mip attenuation (single fused entry point).

    Equals ``positional_encoding(x, rank, chan_scale * pe_weights(var,
    rank))`` bitwise. Under the (default-off, see the section comment
    above) ``pe_packed`` toggle the [N, R*d] elementwise chain runs
    with P samples packed per row.

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

    freq_rep = _freq_pattern_sti(rank, p, d).astype(x.dtype)
    ph = freq_rep * _rep_bands(_pack_rows(x, p), rank, p, d)

    s: Optional[Array] = None
    if chan_scale is not None:
        # [1, R*d] (t,i) -> [1, p*R*d] (s,t,i): the whole per-channel
        # vector repeats once per packed sample
        s = jnp.tile(chan_scale.reshape(1, rank * d), (1, p))
    if var is not None:
        fsq_rep = _freq_pattern_sti(rank, p, d, square=True)
        w = jnp.exp(-0.5 * fsq_rep * _rep_bands(_pack_rows(var, p), rank, p, d))
        s = w if s is None else s * w

    if s is not None:
        p_sin, p_cos = s * jnp.sin(ph), s * jnp.cos(ph)
    else:
        p_sin, p_cos = jnp.sin(ph), jnp.cos(ph)
    return jnp.concatenate(
        [_unpack_rows(p_sin, rank, p, d, n), _unpack_rows(p_cos, rank, p, d, n)],
        axis=-1,
    )
