"""Fused SDF-trunk-with-normals Pallas kernel (the NeuS hot loop).

NeuS needs the trunk features AND the spatial gradient of channel 0
(the SDF) — the reference differentiates through the whole MLP with
torch.autograd.grad(create_graph=True) (neus.py:133-142), which as XLA
(fields/neus.py normals="reverse") runs reverse-over-reverse through an
UNFUSED trunk: every activation round-trips HBM twice. This kernel runs
the trunk AND the explicit channel-0 reverse sweep (ops/sdf_grad.py is
the jnp twin/oracle) VMEM-resident per sample tile:

* forward: L matmuls for the trunk + L transposed matmuls for the
  sweep (single stream each — vs 4 streams for the forward-mode dual
  kernel, which measured 2.2x slower than even the unfused reverse);
  per-layer pre-activations stream to an HBM stash for the backward.
* backward: hand-written VJP of the (h, gE) pair — the adjoint of the
  reverse sweep (an ASCENDING second sweep carrying f'' couplings) plus
  the standard trunk backward with the combined z cotangents; dW/db
  accumulate across the sequential grid. Derivation in ops/sdf_grad.py
  terms:
      q̄_0 = cg;  q̄_l[h] = p̄_{l-1}·f'(z_{l-1}), q̄_l[e] = cg (skips)
      z̄s_{l-1} += p̄_{l-1}·q_l[h]·f''(z_{l-1});  p̄_l = q̄_l @ W_l
      W̄_l += q̄_lᵀ @ p_l;   top: z̄s_{L-1} += p̄_{L-1}·e0·f''(z_{L-1})
  then descending:  z̄_l = h̄_l·f'(z_l) + z̄s_l;  W̄_l += in_lᵀ z̄_l;
      h̄_{l-1}/ē from z̄_l @ W_lᵀ.

Layout conventions match kernels/mlp.py: layout[l] marks a post-skip
layer consuming [h_{l-1}, e] (hidden rows FIRST — the NeRF/NeuS concat
order). Verified (values + first/second-order grads) against
ops/sdf_grad.py and jax.grad in tests/kernels/test_sdf_mlp.py.
STATUS: benchmarked on v5e 2026-08-18 (same-session A/B,
tools/ab_flagship.py neus_normals reverse sweep): full NeuS train step
15.32 ms vs 21.1 ms for the reverse-mode trunk — 1.38x, 33.4k vs 24.2k
rays/s, identical loss. fields/neus.py normals="auto" therefore
resolves to this kernel on TPU (reverse-mode elsewhere).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neddf_tpu.kernels.dual_mlp import (
    _MM_DTYPE,
    _act_fns,
    _mm,
    _mm_nt,
    _mm_tn,
)

Array = jax.Array

TILE_M = 512
# v5e A/B 2026-08-18 (tools/ab_flagship.py sdf_tile_bwd, two sessions):
# 512 = 15.32-15.37 ms vs 256 = 15.47-15.91 ms full NeuS step (~3%).
# Fits the 48 MB vmem budget; rows are padded to TILE_M=512 multiples.
TILE_M_BWD = 512


def _onehot0(tile: int, c: int) -> Array:
    """[1, C] one-hot on channel 0, built via iota (no captured consts)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    return (k == 0).astype(jnp.float32)


def _trunk_and_sweep(e, w_refs, b_refs, layout, f, df, e_dim):
    """Shared fwd computation: returns (zs, h, qs, ps, gE).

    ``ps[li]`` is the p USED at layer li's q (p_in in the derivation);
    ``qs[li]`` the q it produced. All f32.
    """
    n_layers = len(layout)
    zs = []
    h = None
    for li in range(n_layers):
        w, b = w_refs[li][:], b_refs[li][:]
        if li == 0:
            z = _mm(e, w) + b
        elif layout[li]:
            c = h.shape[-1]
            z = _mm(h, w[:c]) + _mm(e, w[c:]) + b
        else:
            z = _mm(h, w) + b
        zs.append(z)
        h = f(z)

    c_out = h.shape[-1]
    p = df(zs[-1]) * _onehot0(e.shape[0], c_out)
    gE = None
    qs = [None] * n_layers
    ps = [None] * n_layers
    for li in range(n_layers - 1, -1, -1):
        ps[li] = p
        q = _mm_nt(p, w_refs[li][:])  # p @ W^T -> [T, C_in_l]
        qs[li] = q
        if li == 0:
            gE = q if gE is None else gE + q
        elif layout[li]:
            c = q.shape[-1] - e_dim
            gE = q[:, c:] if gE is None else gE + q[:, c:]
            p = q[:, :c] * df(zs[li - 1])
        else:
            p = q * df(zs[li - 1])
    return zs, h, qs, ps, gE


def _fwd_kernel(layout, act_name, e_dim, out_dtype, want_stash, *refs):
    """refs = [e, (w, b) * L] in + [h_out, g_out] (+ z stash per layer)."""
    n_layers = len(layout)
    e_ref = refs[0]
    wb = refs[1 : 1 + 2 * n_layers]
    w_refs, b_refs = wb[0::2], wb[1::2]
    if want_stash:
        h_ref, g_ref = refs[-2 - n_layers], refs[-1 - n_layers]
        stash_refs = refs[-n_layers:]
    else:
        h_ref, g_ref = refs[-2], refs[-1]
        stash_refs = None

    f, df, _ = _act_fns(act_name)
    e = e_ref[:].astype(jnp.float32)
    zs, h, _, _, gE = _trunk_and_sweep(
        e, w_refs, b_refs, layout, f, df, e_dim
    )
    if stash_refs is not None:
        for li, z in enumerate(zs):
            stash_refs[li][:] = z.astype(_MM_DTYPE[0])
    h_ref[:] = h.astype(h_ref.dtype)
    g_ref[:] = gE.astype(g_ref.dtype)


def _bwd_kernel(layout, act_name, e_dim, *refs):
    """refs = [e, (w, b) * L, ch, cg, (*z stash)] in
         + [de, (dw, db) * L] out."""
    n_layers = len(layout)
    e_ref = refs[0]
    wb = refs[1 : 1 + 2 * n_layers]
    w_refs, b_refs = wb[0::2], wb[1::2]
    ch_ref = refs[1 + 2 * n_layers]
    cg_ref = refs[2 + 2 * n_layers]
    stash_refs = refs[3 + 2 * n_layers : 3 + 3 * n_layers]
    outs = refs[3 + 3 * n_layers :]
    de_ref = outs[0]
    dwb = outs[1:]
    dw_refs, db_refs = dwb[0::2], dwb[1::2]

    f, df, ddf = _act_fns(act_name)
    is_first = pl.program_id(0) == 0
    e = e_ref[:].astype(jnp.float32)
    tile = e.shape[0]

    # replay: read stashed pre-activations; rebuild h's and the sweep
    zs = [r[:].astype(jnp.float32) for r in stash_refs]
    hs = [f(z) for z in zs]
    c_out = hs[-1].shape[-1]
    p = df(zs[-1]) * _onehot0(tile, c_out)
    qs = [None] * n_layers
    ps = [None] * n_layers
    for li in range(n_layers - 1, -1, -1):
        ps[li] = p
        q = _mm_nt(p, w_refs[li][:])
        qs[li] = q
        if li > 0:
            if layout[li]:
                c = q.shape[-1] - e_dim
                p = q[:, :c] * df(zs[li - 1])
            else:
                p = q * df(zs[li - 1])

    ch = ch_ref[:].astype(jnp.float32)
    cg = cg_ref[:].astype(jnp.float32)

    # ---- adjoint of the sweep (ascending) ---------------------------
    zbar_sweep = [None] * n_layers
    dws = [None] * n_layers
    pbar_prev = None  # p̄_in(li-1)
    for li in range(n_layers):
        w = w_refs[li][:]
        if li == 0:
            qbar = cg
        else:
            d1 = df(zs[li - 1])
            if layout[li]:
                c = qs[li].shape[-1] - e_dim
                qbar_h = pbar_prev * d1
                qbar = jnp.concatenate(
                    [qbar_h, jnp.broadcast_to(cg, (tile, e_dim))], axis=-1
                )
                zb = pbar_prev * qs[li][:, :c] * ddf(zs[li - 1])
            else:
                qbar = pbar_prev * d1
                zb = pbar_prev * qs[li] * ddf(zs[li - 1])
            prev = zbar_sweep[li - 1]
            zbar_sweep[li - 1] = zb if prev is None else prev + zb
        dws[li] = _mm_tn(qbar, ps[li])  # q̄ᵀ @ p_in -> [C_in, C_out]
        pbar_prev = _mm(qbar, w)
    # top of the sweep: p_top = onehot0 * f'(z_{L-1})
    zb_top = pbar_prev * _onehot0(tile, c_out) * ddf(zs[-1])
    prev = zbar_sweep[-1]
    zbar_sweep[-1] = zb_top if prev is None else prev + zb_top

    # ---- combined trunk backward (descending) -----------------------
    hbar = ch
    ebar = None
    for li in range(n_layers - 1, -1, -1):
        w = w_refs[li][:]
        zbar = hbar * df(zs[li])
        if zbar_sweep[li] is not None:
            zbar = zbar + zbar_sweep[li]
        db = jnp.sum(zbar, axis=0)
        if li == 0:
            dw2 = _mm_tn(e, zbar)
            inbar = _mm_nt(zbar, w)
            ebar = inbar if ebar is None else ebar + inbar
        elif layout[li]:
            c = hs[li - 1].shape[-1]
            dw2 = jnp.concatenate(
                [_mm_tn(hs[li - 1], zbar), _mm_tn(e, zbar)], axis=0
            )
            inbar = _mm_nt(zbar, w)
            hbar = inbar[:, :c]
            eb = inbar[:, c:]
            ebar = eb if ebar is None else ebar + eb
        else:
            dw2 = _mm_tn(hs[li - 1], zbar)
            hbar = _mm_nt(zbar, w)
        dw = dws[li] + dw2

        @pl.when(is_first)
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw
            db_refs[li][:] = db

        @pl.when(jnp.logical_not(is_first))
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw_refs[li][:] + dw
            db_refs[li][:] = db_refs[li][:] + db

    de_ref[:] = ebar.astype(de_ref.dtype)


def _wb_specs(weights):
    specs = []
    for w in weights:
        specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
    return specs


def _run_forward(e, weights, biases, layout, act_name, out_dtype,
                 interpret, want_stash):
    m, e_dim = e.shape
    if m % TILE_M:
        raise ValueError(f"rows {m} not a multiple of TILE_M={TILE_M}")
    c_out = weights[-1].shape[-1]
    odt = jnp.dtype(out_dtype)
    in_specs = [
        pl.BlockSpec((TILE_M, e_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + _wb_specs(weights)
    out_specs = [
        pl.BlockSpec((TILE_M, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_M, e_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, c_out), odt),
        jax.ShapeDtypeStruct((m, e_dim), odt),
    ]
    if want_stash:
        for w in weights:
            c = w.shape[-1]
            out_specs.append(
                pl.BlockSpec(
                    (TILE_M, c), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
            )
            out_shape.append(jax.ShapeDtypeStruct((m, c), _MM_DTYPE[0]))
    args = [e]
    for w, b in zip(weights, biases):
        args += [w, b]
    params = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, layout, act_name, e_dim, odt, want_stash
        ),
        grid=(m // TILE_M,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else params,
    )(*args)
    if want_stash:
        return outs[0], outs[1], tuple(outs[2:])
    return outs[0], outs[1]


def _run_backward(e, weights, biases, layout, act_name, ch, cg, pres,
                  interpret):
    m, e_dim = e.shape
    tile = TILE_M_BWD
    c_out = weights[-1].shape[-1]
    in_specs = [
        pl.BlockSpec((tile, e_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + _wb_specs(weights)
    in_specs += [
        pl.BlockSpec((tile, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, e_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for p in pres:
        in_specs.append(
            pl.BlockSpec(
                (tile, p.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        )
    out_specs = [
        pl.BlockSpec((tile, e_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((m, e_dim), e.dtype)]
    for w in weights:
        out_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_shape.append(jax.ShapeDtypeStruct((w.shape[-1],), jnp.float32))
    args = [e]
    for w, b in zip(weights, biases):
        args += [w, b]
    args += [ch, cg] + list(pres)
    params = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, layout, act_name, e_dim),
        grid=(m // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else params,
    )(*args)
    de = outs[0]
    rest = outs[1:]
    return de, tuple(rest[0::2]), tuple(rest[1::2])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def sdf_mlp(
    e: Array,
    weights: Tuple[Array, ...],
    biases: Tuple[Array, ...],
    layout: Tuple[bool, ...],
    act_name: str,
    out_dtype: str = "float32",
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused trunk + channel-0 gradient: (h [M, C], gE [M, E]).

    ``gE = d h[:, 0] / d e`` exactly as ops/sdf_grad.py computes it.
    M must be a TILE_M multiple (kernels.dual_mlp.pad_rows).
    """
    return _run_forward(
        e, tuple(weights), tuple(biases), layout, act_name, out_dtype,
        interpret, want_stash=False,
    )


def _sdf_fwd(e, weights, biases, layout, act_name, out_dtype, interpret):
    h, gE, pres = _run_forward(
        e, tuple(weights), tuple(biases), layout, act_name, out_dtype,
        interpret, want_stash=True,
    )
    return (h, gE), (e, tuple(weights), tuple(biases), pres)


def _sdf_bwd(layout, act_name, out_dtype, interpret, res, g):
    e, weights, biases, pres = res
    ch, cg = g
    de, dws, dbs = _run_backward(
        e, weights, biases, layout, act_name, ch, cg, pres, interpret
    )
    dws = tuple(d.astype(w.dtype) for d, w in zip(dws, weights))
    dbs = tuple(d.astype(b.dtype) for d, b in zip(dbs, biases))
    return de, dws, dbs


sdf_mlp.defvjp(_sdf_fwd, _sdf_bwd)
