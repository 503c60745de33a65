"""Fused plain-MLP Pallas kernel (NeRF/NeuS-style value-only trunks).

The value-only counterpart of kernels/dual_mlp.py: a whole MLP trunk
runs VMEM-resident per sample tile (bf16 MXU matmuls, f32 accumulation)
with a hand-written recompute-backward, so no activation ever reaches
HBM. Differences from the dual kernel:

* single value stream [M, C] — one matmul per layer;
* NeRF's skip concat is ``[hx, embed]`` (nerf.py:152-155 — hidden
  FIRST, the opposite of NeDDF), expressed as split weight rows
  ``W[:C_hidden]`` for the hidden state and ``W[C_hidden:]`` for the
  re-injected first segment;
* multi-segment first layer like the dual kernel (used by color heads
  that consume [features, PE(dir)] without materialising the concat).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neddf_tpu.kernels.dual_mlp import _act_fns, _mm, _mm_nt, _mm_tn, _offsets

Array = jax.Array

TILE_M = 1024
TILE_M_BWD = 512

# HBM pre-activation stash for the backward (the dual_mlp/sdf_mlp
# strategy: forward writes each layer's pre-activations, backward skips
# the recompute loop). Trace-time flag like dual_mlp._BWD_STASH — see
# the bwd_stash docstring there for the jit-cache caveat. Default OFF:
# measured NEGATIVE on v5e (2026-08-18 A/Bs, BASELINE.md) — NeuS's f32
# color branch pays 2x the stash traffic (16.1 vs 15.5-15.7 ms) and the
# bf16 NeRF family lands within tunnel-timing noise; the plain backward
# only recomputes ONE value stream, so unlike the dual kernel there is
# little recompute to save.
_MLP_STASH = [False]


class mlp_stash:
    """Context manager toggling the stashed mlp_seg backward (A/Bs).

    TRACE-TIME semantics — identical caveats to dual_mlp.bwd_stash:
    build fresh jitted callables inside each scope.
    """

    def __init__(self, on: bool):
        self.on = on

    def __enter__(self):
        self.prev = _MLP_STASH[0]
        _MLP_STASH[0] = self.on

    def __exit__(self, *exc):
        _MLP_STASH[0] = self.prev


def _layer_pre(h, seg, offs, widths, w, b, li, split):
    if li == 0:
        pre = None
        for i in range(len(seg)):
            term = _mm(seg[i], w[offs[i] : offs[i] + widths[i], :])
            pre = term if pre is None else pre + term
        return pre + b
    if split:
        ch = h.shape[-1]
        return _mm(h, w[:ch, :]) + _mm(seg[0], w[ch:, :]) + b
    return _mm(h, w) + b


def _fwd_kernel(layout, act_name, widths, out_dtype, want_stash, *refs):
    n_seg = len(widths)
    n_layers = len(layout)
    v_refs = refs[:n_seg]
    wb = refs[n_seg : n_seg + 2 * n_layers]
    w_refs, b_refs = wb[0::2], wb[1::2]
    if want_stash:
        out_ref = refs[n_seg + 2 * n_layers]
        pre_refs = refs[n_seg + 2 * n_layers + 1 :]
    else:
        out_ref = refs[-1]
        pre_refs = None

    f, _, _ = _act_fns(act_name)
    offs = _offsets(widths)
    seg = [v_refs[i][:] for i in range(n_seg)]
    h = None
    for li, split in enumerate(layout):
        pre = _layer_pre(h, seg, offs, widths, w_refs[li][:], b_refs[li][:], li, split)
        if want_stash:
            # stash in the segment dtype (bf16 in production — the same
            # precision/VMEM trade dual_mlp ships; f32 inputs stay exact)
            pre_refs[li][:] = pre.astype(pre_refs[li].dtype)
        h = f(pre)
    out_ref[:] = h.astype(out_dtype)


def _bwd_kernel(layout, act_name, widths, has_stash, *refs):
    n_seg = len(widths)
    n_layers = len(layout)
    v_refs = refs[:n_seg]
    wb = refs[n_seg : n_seg + 2 * n_layers]
    w_refs, b_refs = wb[0::2], wb[1::2]
    g_ref = refs[n_seg + 2 * n_layers]
    n_in = n_seg + 2 * n_layers + 1
    pre_refs = refs[n_in : n_in + n_layers] if has_stash else None
    outs = refs[n_in + n_layers :] if has_stash else refs[n_in:]
    dv_refs = outs[:n_seg]
    dwb = outs[n_seg:]
    dw_refs, db_refs = dwb[0::2], dwb[1::2]

    f, df, _ = _act_fns(act_name)
    offs = _offsets(widths)
    is_first = pl.program_id(0) == 0
    seg = [v_refs[i][:] for i in range(n_seg)]

    if has_stash:
        # forward pre-activations arrive from the HBM stash; compute
        # f/df in f32 (Mosaic lacks bf16 compare ops, and this matches
        # the recompute path's f32 accumulator type)
        pres = [
            pre_refs[li][:].astype(jnp.float32) for li in range(n_layers)
        ]
    else:
        # recompute forward, stash pre-activations in VMEM
        h = None
        pres = []
        for li, split in enumerate(layout):
            pre = _layer_pre(
                h, seg, offs, widths, w_refs[li][:], b_refs[li][:], li, split
            )
            pres.append(pre)
            h = f(pre)

    g = g_ref[:].astype(jnp.float32)
    g_skip = jnp.zeros((seg[0].shape[0], widths[0]), jnp.float32)
    for li in reversed(range(n_layers)):
        split = layout[li]
        w = w_refs[li][:]
        gpre = g * df(pres[li])
        db = jnp.sum(gpre, axis=0)
        h_in = f(pres[li - 1]) if li > 0 else None
        # dW / dx as dot_general with transposed contracting dims — an
        # explicit .T would spend VPU shuffles per tile per layer
        # (measured win on the dual kernel, see dual_mlp.py::_mm_tn)
        if li == 0:
            dw_blocks = []
            for i in range(n_seg):
                rows = w[offs[i] : offs[i] + widths[i], :]
                d_in = _mm_nt(gpre, rows)
                if i == 0:
                    d_in = d_in + g_skip
                # input cotangents leave in the primal dtype (bf16 in
                # production) — halves the HBM write traffic
                dv_refs[i][:] = d_in.astype(dv_refs[i].dtype)
                dw_blocks.append(_mm_tn(seg[i], gpre))
            dw = jnp.concatenate(dw_blocks, axis=0)
        elif split:
            ch = h_in.shape[-1]
            g_skip = g_skip + _mm_nt(gpre, w[ch:, :])
            dw = jnp.concatenate(
                [_mm_tn(h_in, gpre), _mm_tn(seg[0], gpre)], axis=0
            )
            g = _mm_nt(gpre, w[:ch, :])
        else:
            dw = _mm_tn(h_in, gpre)
            g = _mm_nt(gpre, w)

        @pl.when(is_first)
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw
            db_refs[li][:] = db

        @pl.when(jnp.logical_not(is_first))
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw_refs[li][:] + dw
            db_refs[li][:] = db_refs[li][:] + db


def _specs(widths, tile):
    return [
        pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for w in widths
    ]


def _run_forward(vs, weights, biases, layout, act_name, out_dtype, interpret,
                 want_stash=False):
    m = vs[0].shape[0]
    widths = tuple(v.shape[-1] for v in vs)
    c_out = weights[-1].shape[-1]
    in_specs = _specs(widths, TILE_M)
    for w in weights:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
    args = list(vs)
    for w, b in zip(weights, biases):
        args += [w, b]
    odt = jnp.dtype(out_dtype)
    out_specs = pl.BlockSpec(
        (TILE_M, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((m, c_out), odt)
    if want_stash:
        sdt = vs[0].dtype
        out_specs = [out_specs] + [
            pl.BlockSpec(
                (TILE_M, w.shape[-1]), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            for w in weights
        ]
        out_shape = [out_shape] + [
            jax.ShapeDtypeStruct((m, w.shape[-1]), sdt) for w in weights
        ]
    # the stash adds n_layers [TILE, C] output buffers (double-buffered)
    # on top of the default 16 MB scoped-vmem budget — raise it like
    # sdf_mlp/dual_mlp do for their stash variants
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
        if want_stash and not interpret else None
    )
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, layout, act_name, widths, odt, want_stash
        ),
        grid=(m // TILE_M,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=params,
    )(*args)
    if want_stash:
        return outs[0], tuple(outs[1:])
    return outs


def _run_backward(vs, weights, biases, layout, act_name, g, interpret,
                  pres=None):
    m = vs[0].shape[0]
    widths = tuple(v.shape[-1] for v in vs)
    tile = TILE_M_BWD
    c_out = weights[-1].shape[-1]
    in_specs = _specs(widths, tile)
    for w in weights:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
    in_specs.append(
        pl.BlockSpec((tile, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    if pres is not None:
        for p in pres:
            in_specs.append(
                pl.BlockSpec(
                    (tile, p.shape[-1]), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                )
            )
    out_specs = _specs(widths, tile)
    # dx cotangents in the primal dtypes; dW/db stay f32 (grid-accumulated)
    out_shape = [
        jax.ShapeDtypeStruct((m, w), v.dtype) for w, v in zip(widths, vs)
    ]
    for w in weights:
        out_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_shape.append(jax.ShapeDtypeStruct((w.shape[-1],), jnp.float32))
    args = list(vs)
    for w, b in zip(weights, biases):
        args += [w, b]
    args.append(g)
    if pres is not None:
        args += list(pres)
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
        if pres is not None and not interpret else None
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, layout, act_name, widths, pres is not None
        ),
        grid=(m // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=params,
    )(*args)
    n_seg = len(widths)
    dvs = tuple(outs[:n_seg])
    rest = outs[n_seg:]
    return dvs, tuple(rest[0::2]), tuple(rest[1::2])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def mlp_seg(
    vs: Tuple[Array, ...],
    weights: Tuple[Array, ...],
    biases: Tuple[Array, ...],
    layout: Tuple[bool, ...],
    act_name: str,
    out_dtype: str = "float32",
    interpret: bool = False,
) -> Array:
    """Fused multi-segment plain MLP: concat(vs) through L dense+act
    layers; layout-True layers re-inject segment 0 AFTER the hidden
    state (NeRF skip order). Returns [M, C_last]."""
    return _run_forward(tuple(vs), tuple(weights), tuple(biases), layout,
                        act_name, out_dtype, interpret)


def _mlp_fwd(vs, weights, biases, layout, act_name, out_dtype, interpret):
    if _MLP_STASH[0]:
        out, pres = _run_forward(
            tuple(vs), tuple(weights), tuple(biases), layout, act_name,
            out_dtype, interpret, want_stash=True,
        )
        return out, (tuple(vs), tuple(weights), tuple(biases), pres)
    out = _run_forward(tuple(vs), tuple(weights), tuple(biases), layout,
                       act_name, out_dtype, interpret)
    return out, (tuple(vs), tuple(weights), tuple(biases), None)


def _mlp_bwd(layout, act_name, out_dtype, interpret, res, g):
    vs, weights, biases, pres = res
    # cotangent enters in the kernel OUTPUT dtype and dx cotangents leave
    # in the primal input dtypes — no f32 staging around the kernel
    dvs, dws, dbs = _run_backward(
        vs, weights, biases, layout, act_name, g, interpret, pres=pres
    )
    dws = tuple(d.astype(w.dtype) for d, w in zip(dws, weights))
    dbs = tuple(d.astype(b.dtype) for d, b in zip(dbs, biases))
    return dvs, dws, dbs


mlp_seg.defvjp(_mlp_fwd, _mlp_bwd)
