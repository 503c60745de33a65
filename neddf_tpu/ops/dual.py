"""Dense dual-tensor algebra for forward-mode spatial Jacobians.

The reference carries (value, Jacobian) *pairs* through its distance-field
MLP via ~700 LoC of hand-written torch.autograd.Functions
(neddf/nn_module/with_grad/*). Here the pair is a single dual tensor

    D[..., 4, C]   with   D[..., 0, :] = value
                          D[..., 1+a, :] = d(value)/d(x_a),  a in {0,1,2}

so a dense layer is ONE ``[4M, C] x [C, C']`` matmul (MXU-shaped), the
value path is computed exactly once (no jacfwd primal duplication), and
activations are a broadcast over the tangent rows. Everything is built
from differentiable jnp primitives, so reverse-mode through the Jacobian
(density depends on grad-of-distance; the loss differentiates through it)
is exact by construction — replacing the reference's hand-written
second-derivative backward terms (e.g. with_grad/softplus.py:83-89).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from neddf_tpu.ops.pe import pe_frequencies

Array = jax.Array

DUAL_ROWS = 4  # 1 value row + 3 spatial tangent rows


def pack_dual(y: Array, jac: Optional[Array] = None) -> Array:
    """Pack value [M, C] (+ optional Jacobian [M, 3, C]) into [M, 4, C]."""
    if jac is None:
        jac = jnp.zeros((*y.shape[:-1], 3, y.shape[-1]), dtype=y.dtype)
    return jnp.concatenate([y[..., None, :], jac], axis=-2)


def dual_value(d: Array) -> Array:
    """[M, 4, C] -> value [M, C]."""
    return d[..., 0, :]


def dual_jacobian(d: Array) -> Array:
    """[M, 4, C] -> Jacobian [M, 3, C]."""
    return d[..., 1:, :]


def linear_dual(d: Array, w: Array, b: Optional[Array] = None) -> Array:
    """Dense layer on a dual tensor: value row gets xW+b, tangents get JW.

    Equivalent to the reference LinearGradFunction
    (neddf/nn_module/with_grad/linear.py:14-46) but as one batched matmul.
    """
    m, k, c = d.shape
    out = (d.reshape(m * k, c) @ w).reshape(m, k, w.shape[-1])
    if b is not None:
        out = out.at[:, 0, :].add(b)
    return out


def act_dual(
    d: Array,
    f: Callable[[Array], Array],
    dfdx: Callable[[Array], Array],
) -> Array:
    """Elementwise activation on a dual tensor (chain rule on tangents)."""
    y = d[..., 0:1, :]
    return jnp.concatenate([f(y), dfdx(y) * d[..., 1:, :]], axis=-2)


def pe_dual(x: Array, rank: int, scale: Optional[Array] = None) -> Array:
    """Positional encoding emitting a dual tensor [M, 4, 6R].

    Matches PositionalEncodingGradLayer.forward with the identity input
    Jacobian (with_grad/positional_encoding.py:34-87): the tangent rows
    are the exact d(scale * sin/cos(freq * x_i))/d(x_a), i.e. nonzero only
    where the channel's input axis i equals the tangent axis a.

    Args:
        x: [M, 3] positions.
        rank: PE rank R.
        scale: broadcastable against [M, R*3]; applied to BOTH value and
            tangent rows (the reference scales y and G identically).
    """
    m, input_dim = x.shape
    freq = pe_frequencies(rank, dtype=x.dtype)  # [R]
    # tile-multiply, not [M, R, 3]-reshape — the rank-3 reshape forces
    # minor-dim layout copies downstream (see ops/pe.py::pe_weights)
    p = jnp.repeat(freq, input_dim)[None, :] * jnp.tile(x, (1, rank))
    if scale is None:
        scale = jnp.ones((1, rank * input_dim), dtype=x.dtype)
    sin_p, cos_p = jnp.sin(p), jnp.cos(p)
    y = jnp.concatenate([scale * sin_p, scale * cos_p], axis=-1)  # [M, 6R]

    freq_rep = jnp.repeat(freq, input_dim)[None, :]  # [1, R*3]
    # d(phase_k)/d(x_a) = freq * delta(a == i(k)) in the (t, i) layout
    onehot = jnp.tile(jnp.eye(input_dim, dtype=x.dtype), (1, rank))  # [3, R*3]
    g_sin = (scale * freq_rep * cos_p)[:, None, :] * onehot[None, :, :]
    g_cos = (-scale * freq_rep * sin_p)[:, None, :] * onehot[None, :, :]
    jac = jnp.concatenate([g_sin, g_cos], axis=-1)  # [M, 3, 6R]
    return pack_dual(y, jac)


def pe_dual_planes(
    x: Array, rank: int, scale: Optional[Array] = None
) -> Tuple[Array, Array]:
    """Positional-encoding dual emitted directly in PLANE layout.

    Same math as :func:`pe_dual` but returns ``(v [M, 6R], j [3, M, 6R])``
    — the layout the fused kernels consume (kernels/dual_mlp.py) — built
    with one masked broadcast instead of onehot-multiply + pack +
    moveaxis. On TPU the pack/transpose route costs ~1 ms/step at the
    flagship shapes purely in layout shuffles; this is measurably free.
    """
    m, input_dim = x.shape
    freq = pe_frequencies(rank, dtype=x.dtype)  # [R]
    # tile-multiply, not [M, R, 3]-reshape — the rank-3 reshape forces
    # minor-dim layout copies downstream (see ops/pe.py::pe_weights)
    p = jnp.repeat(freq, input_dim)[None, :] * jnp.tile(x, (1, rank))
    if scale is None:
        scale = jnp.ones((1, rank * input_dim), dtype=x.dtype)
    sin_p, cos_p = jnp.sin(p), jnp.cos(p)
    v = jnp.concatenate([scale * sin_p, scale * cos_p], axis=-1)  # [M, 6R]

    freq_rep = jnp.repeat(freq, input_dim)[None, :]  # [1, R*3]
    g_full = jnp.concatenate(
        [scale * freq_rep * cos_p, -scale * freq_rep * sin_p], axis=-1
    )  # [M, 6R] — d(channel)/d(its own input axis)
    mask = jnp.tile(jnp.eye(input_dim, dtype=x.dtype), (1, rank))  # [3, R*3]
    mask = jnp.concatenate([mask, mask], axis=-1)  # [3, 6R]
    j = mask[:, None, :] * g_full[None, :, :]  # [3, M, 6R]
    return v, j


def _packed_pe_pieces(
    x: Array, rank: int, var: Optional[Array], chan_scale: Optional[Array]
):
    """Shared lane-packed front end for the ``*_mip`` dual builders.

    Returns ``(sin_p, cos_p, s, fr, p, d)`` all in the packed
    SAMPLE-MAJOR (s, t, i) layout (see ops/pe.py packed section — the
    unpack back to per-sample rows is then a pure reshape, never a
    transpose) — or None when packing is disabled/not applicable,
    signalling the caller to take the unpacked route. ``s`` is
    chan_scale * exp-mip weights (None if neither given); ``fr`` the
    packed frequency pattern.
    """
    from neddf_tpu.ops.pe import (
        _PE_PACKED,
        _freq_pattern_sti,
        _pack_rows,
        _rep_bands,
    )

    n, d = x.shape
    p = max(1, 128 // (rank * d))
    if not _PE_PACKED[0] or p == 1 or n < p:
        return None
    fr = _freq_pattern_sti(rank, p, d).astype(x.dtype)
    ph = fr * _rep_bands(_pack_rows(x, p), rank, p, d)
    s: Optional[Array] = None
    if chan_scale is not None:
        s = jnp.tile(chan_scale.reshape(1, rank * d), (1, p))
    if var is not None:
        fsq = _freq_pattern_sti(rank, p, d, square=True)
        w = jnp.exp(-0.5 * fsq * _rep_bands(_pack_rows(var, p), rank, p, d))
        s = w if s is None else s * w
    return jnp.sin(ph), jnp.cos(ph), s, fr, p, d


def _mip_scale(
    rank: int, var: Optional[Array], chan_scale: Optional[Array]
) -> Optional[Array]:
    """Unpacked-route scale: chan_scale * pe_weights(var, rank)."""
    from neddf_tpu.ops.pe import pe_weights

    s = chan_scale
    if var is not None:
        w = pe_weights(var, rank)
        s = w if s is None else s * w
    return s


def pe_dual_planes_mip(
    x: Array,
    rank: int,
    var: Optional[Array] = None,
    chan_scale: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """``pe_dual_planes(x, rank, chan_scale * pe_weights(var, rank))``,
    bitwise. Under the default-off ``pe_packed`` toggle the [M, R*3]
    sin/cos/exp/multiply chain runs lane-packed (measured negative on
    v5e — see ops/pe.py's packed section for the numbers + mechanism)."""
    pieces = _packed_pe_pieces(x, rank, var, chan_scale)
    if pieces is None:
        return pe_dual_planes(x, rank, _mip_scale(rank, var, chan_scale))
    from neddf_tpu.ops.pe import _unpack_rows

    sin_p, cos_p, s, fr, p, d = pieces
    n = x.shape[0]
    if s is None:
        s = jnp.ones((1, rank * p * d), dtype=x.dtype)
    v = jnp.concatenate(
        [
            _unpack_rows(s * sin_p, rank, p, d, n),
            _unpack_rows(s * cos_p, rank, p, d, n),
        ],
        axis=-1,
    )
    g_full = jnp.concatenate(
        [
            _unpack_rows(s * fr * cos_p, rank, p, d, n),
            _unpack_rows(-s * fr * sin_p, rank, p, d, n),
        ],
        axis=-1,
    )
    mask = jnp.tile(jnp.eye(d, dtype=x.dtype), (1, rank))  # [3, R*3]
    mask = jnp.concatenate([mask, mask], axis=-1)  # [3, 6R]
    j = mask[:, None, :] * g_full[None, :, :]  # [3, M, 6R]
    return v, j


def pe_dual_directional_mip(
    x: Array,
    rank: int,
    v: Array,
    var: Optional[Array] = None,
    chan_scale: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """``pe_dual_directional(x, rank, v, chan_scale * pe_weights(var,
    rank))``, bitwise, lane-packed like :func:`pe_dual_planes_mip`."""
    pieces = _packed_pe_pieces(x, rank, var, chan_scale)
    if pieces is None:
        return pe_dual_directional(
            x, rank, v, _mip_scale(rank, var, chan_scale)
        )
    from neddf_tpu.ops.pe import _pack_rows, _rep_bands, _unpack_rows

    sin_p, cos_p, s, fr, p, d = pieces
    n = x.shape[0]
    if s is None:
        s = jnp.ones((1, rank * p * d), dtype=x.dtype)
    val = jnp.concatenate(
        [
            _unpack_rows(s * sin_p, rank, p, d, n),
            _unpack_rows(s * cos_p, rank, p, d, n),
        ],
        axis=-1,
    )
    v_rep = _rep_bands(_pack_rows(v.astype(x.dtype), p), rank, p, d)
    tan = jnp.concatenate(
        [
            _unpack_rows(s * fr * cos_p * v_rep, rank, p, d, n),
            _unpack_rows(-s * fr * sin_p * v_rep, rank, p, d, n),
        ],
        axis=-1,
    )
    return val, tan


def pe_dual_directional(
    x: Array, rank: int, v: Array, scale: Optional[Array] = None
) -> Tuple[Array, Array]:
    """PE value + directional derivative along per-sample direction v.

    Returns ``(val [M, 6R], tan [M, 6R])`` with
    ``tan = sum_a d(PE)/d(x_a) * v[:, a]`` — the K=1 tangent seed for
    JVP-style propagation. Because each PE channel depends on exactly
    one input axis, the contraction is a channel-wise multiply by the
    tiled direction (no [3, M, 6R] Jacobian is ever materialised).
    Exactly ``sum_a pe_dual_planes(x, rank, scale)[1][a] * v[:, a]``.
    """
    m, input_dim = x.shape
    freq = pe_frequencies(rank, dtype=x.dtype)  # [R]
    # tile-multiply, not [M, R, 3]-reshape — the rank-3 reshape forces
    # minor-dim layout copies downstream (see ops/pe.py::pe_weights)
    p = jnp.repeat(freq, input_dim)[None, :] * jnp.tile(x, (1, rank))
    if scale is None:
        scale = jnp.ones((1, rank * input_dim), dtype=x.dtype)
    sin_p, cos_p = jnp.sin(p), jnp.cos(p)
    val = jnp.concatenate([scale * sin_p, scale * cos_p], axis=-1)  # [M, 6R]

    freq_rep = jnp.repeat(freq, input_dim)[None, :]  # [1, R*3]
    # channel k = (t, i) with axis i fastest -> v tiled rank times lines
    # each channel up with d/d(its own axis)
    v_rep = jnp.tile(v.astype(x.dtype), (1, rank))  # [M, R*3]
    tan = jnp.concatenate(
        [
            scale * freq_rep * cos_p * v_rep,
            -scale * freq_rep * sin_p * v_rep,
        ],
        axis=-1,
    )  # [M, 6R]
    return val, tan


def mlp_dual(
    d: Array,
    weights: Tuple[Array, ...],
    biases: Tuple[Array, ...],
    f: Callable[[Array], Array],
    dfdx: Callable[[Array], Array],
    skips: Tuple[int, ...] = (),
    skip_input: Optional[Array] = None,
) -> Array:
    """Run a dual tensor through Linear+act layers with skip re-concat.

    After layer index ``i in skips`` the (dual) skip_input is concatenated
    in FRONT of the hidden state, matching NeDDF's ordering
    (neddf/network/neddf.py:214-219: cat([embed, hx])).
    """
    if skip_input is None:
        skip_input = d
    h = d
    for i, (w, b) in enumerate(zip(weights, biases)):
        h = act_dual(linear_dual(h, w, b), f, dfdx)
        if i in skips:
            h = jnp.concatenate([skip_input, h], axis=-1)
    return h
