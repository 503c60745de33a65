"""Fused dual-tensor MLP Pallas kernel (the NeDDF hot loop).

The NeDDF distance-field trunk propagates (value, d/dxyz-Jacobian) pairs
through 7+ dense layers (reference: neddf/network/neddf.py:214-219 on
top of neddf/nn_module/with_grad/linear.py). As plain XLA this writes
every [M, 4, 256] dual activation to HBM between layers — at the
flagship shapes (M ~ 1.3e5 samples/step) that is gigabytes of traffic
per step and dominates the step time. This kernel runs the ENTIRE trunk
for a tile of samples inside VMEM:

* value stream   v [M, C]      — one row per sample
* tangent stream j [3, M, C]   — d(value)/d(x_a) planes; the activation
  chain rule is a clean 2D broadcast per plane (no sublane reshuffles)
* matmuls run on the MXU in bfloat16 with float32 accumulation; the
  pre-activations (which feed f' and f'') stay float32
* the FIRST layer takes multiple input SEGMENTS: concat([a, b, c]) @ W
  is computed as a @ W[ra] + b @ W[rb] + c @ W[rc] with the row slices
  resident in VMEM — no concat is ever materialised. Segments without a
  Jacobian (e.g. NeDDF's PE(dir) / stop-grad normal inputs,
  neddf.py:243-257) skip the tangent matmuls entirely.
* the reference's skip re-concat ``[embed, h]`` (neddf.py:214-219) uses
  the same split-weight trick, re-injecting segment 0.
* backward is a second kernel that RECOMPUTES the forward per tile
  (activations never touch HBM in either direction) and accumulates
  dW/db across the sequential TPU grid; it hand-implements the dual
  chain rule including the f'' coupling the reference writes by hand
  in its custom backwards (e.g. with_grad/softplus.py:83-89)

Exposed through ``dual_mlp_seg`` (multi-segment) and the single-segment
convenience wrapper ``dual_mlp``, both with jax.custom_vjp so
reverse-over-forward (loss gradients THROUGH the Jacobian-derived
density) works exactly like the jnp path in neddf_tpu.ops.dual.

KNOWN LIMIT: verified correct (vs the jnp path, forward and gradients)
up to M ≈ 4e5 rows per call on v5e. At M ≈ 8e5 (train batch 4096 rays x
194 samples) the grad-compiled program deterministically produces NaNs
on ~14% of rays in BOTH f32 and bf16 while the identical forward-only
program is clean — suspected XLA/Mosaic interaction at that buffer
scale, under investigation. All shipping configs (batch <= 1024 rays,
render chunks <= 1024) stay far below the limit.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_M = 256  # samples per forward grid step
# backward recomputes + stashes per-layer tensors in VMEM, so it uses a
# smaller tile to stay under the ~16MB scoped-VMEM budget
TILE_M_BWD = 128


# ----------------------------------------------------------------- acts
def _act_fns(name: str):
    """(f, f', f'') triples; numerics match neddf_tpu.ops.activations."""
    if name == "tanhExp":
        thr = 20.0

        def f(x):
            xs = jnp.minimum(x, thr)
            return jnp.where(x > thr, x, x * jnp.tanh(jnp.exp(xs)))

        def df(x):
            xs = jnp.minimum(x, thr)
            ex = jnp.exp(xs)
            tx = jnp.tanh(ex)
            return jnp.where(x > thr, 1.0, tx - x * ex * (tx * tx - 1.0))

        def ddf(x):
            xs = jnp.minimum(x, thr)
            ex = jnp.exp(xs)
            tx = jnp.tanh(ex)
            s = 1.0 - tx * tx
            return jnp.where(x > thr, 0.0, ex * s * (2.0 + x - 2.0 * x * ex * tx))

        return f, df, ddf
    if name == "ReLU":
        return (
            lambda x: jnp.maximum(x, 0.0),
            lambda x: (x > 0.0).astype(x.dtype),
            lambda x: jnp.zeros_like(x),
        )
    if name == "LeakyReLU":
        return (
            lambda x: jnp.where(x >= 0.0, x, 0.01 * x),
            lambda x: jnp.where(x >= 0.0, 1.0, 0.01).astype(x.dtype),
            lambda x: jnp.zeros_like(x),
        )
    if name == "Softplus":
        def f(x):
            return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))

        def df(x):
            return jnp.where(x > 20.0, 1.0, jax.nn.sigmoid(x))

        def ddf(x):
            s = jax.nn.sigmoid(x)
            return jnp.where(x > 20.0, 0.0, s * (1.0 - s))

        return f, df, ddf
    raise ValueError(f"unsupported activation {name!r}")


# module-level matmul dtype switch: bf16 for production (MXU native),
# f32 for exact-comparison tests (set via `matmul_dtype` context).
_MM_DTYPE = [jnp.bfloat16]


def _mm(a: Array, b: Array) -> Array:
    """MXU matmul with f32 accumulation."""
    dt = _MM_DTYPE[0]
    return jnp.dot(
        a.astype(dt), b.astype(dt), preferred_element_type=jnp.float32
    )


class matmul_dtype:
    """Context manager to switch the kernel matmul input dtype (tests)."""

    def __init__(self, dtype):
        self.dtype = dtype

    def __enter__(self):
        self.prev = _MM_DTYPE[0]
        _MM_DTYPE[0] = self.dtype

    def __exit__(self, *exc):
        _MM_DTYPE[0] = self.prev


def _offsets(widths: Sequence[int]) -> Tuple[int, ...]:
    out, o = [], 0
    for w in widths:
        out.append(o)
        o += w
    return tuple(out)


# -------------------------------------------------------------- forward
def _fwd_kernel(layout, act_name, has_j, widths, out_dtype, *refs):
    """refs = [*v_segs, *j_segs, (w, b) * L] in + [v_out, j_out] out."""
    n_seg = len(widths)
    n_j = sum(has_j)
    n_layers = len(layout)
    v_refs = refs[:n_seg]
    j_refs = refs[n_seg : n_seg + n_j]
    wb = refs[n_seg + n_j : n_seg + n_j + 2 * n_layers]
    w_refs, b_refs = wb[0::2], wb[1::2]
    vo_ref, jo_ref = refs[-2], refs[-1]

    f, df, _ = _act_fns(act_name)
    offs = _offsets(widths)
    seg_v = [v_refs[i][:] for i in range(n_seg)]
    ji = 0
    seg_j = []
    for i in range(n_seg):
        if has_j[i]:
            seg_j.append([j_refs[ji][a] for a in range(3)])
            ji += 1
        else:
            seg_j.append(None)

    v = None
    j = None
    c0 = widths[0]
    for li, split in enumerate(layout):
        w, b = w_refs[li][:], b_refs[li][:]
        if li == 0:
            pre = b
            for i in range(n_seg):
                pre = pre + _mm(seg_v[i], w[offs[i] : offs[i] + widths[i], :])
            jw = [
                sum(
                    _mm(seg_j[i][a], w[offs[i] : offs[i] + widths[i], :])
                    for i in range(n_seg)
                    if seg_j[i] is not None
                )
                for a in range(3)
            ]
        elif split:
            # post-skip layer: input was concat([seg0, h]) (neddf.py:214)
            we, wh = w[:c0, :], w[c0:, :]
            pre = _mm(seg_v[0], we) + _mm(v, wh) + b
            jw = [_mm(seg_j[0][a], we) + _mm(j[a], wh) for a in range(3)]
        else:
            pre = _mm(v, w) + b
            jw = [_mm(j[a], w) for a in range(3)]
        d = df(pre)
        v = f(pre)
        j = [d * jw[a] for a in range(3)]
    vo_ref[:] = v.astype(out_dtype)
    for a in range(3):
        jo_ref[a] = j[a].astype(out_dtype)


def _seg_specs(widths, has_j, tile, c_out):
    in_specs = [
        pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for w in widths
    ]
    in_specs += [
        pl.BlockSpec((3, tile, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        for w, hj in zip(widths, has_j)
        if hj
    ]
    return in_specs


def _run_forward(vs, js, weights, biases, layout, act_name, has_j, out_dtype,
                 interpret=False):
    m = vs[0].shape[0]
    widths = tuple(v.shape[-1] for v in vs)
    c_out = weights[-1].shape[-1]
    grid = (m // TILE_M,)

    in_specs = _seg_specs(widths, has_j, TILE_M, c_out)
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
    out_specs = [
        pl.BlockSpec((TILE_M, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, TILE_M, c_out), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    args = list(vs) + list(js)
    for w, b in zip(weights, biases):
        args += [w, b]
    odt = jnp.dtype(out_dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, layout, act_name, has_j, widths, odt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((m, c_out), odt),
            jax.ShapeDtypeStruct((3, m, c_out), odt),
        ],
        interpret=interpret,
    )(*args)


# ------------------------------------------------------------- backward
def _bwd_kernel(layout, act_name, has_j, widths, *refs):
    """Recompute forward (stash pre & j@W only), reverse the dual chain.

    refs = [*v_segs, *j_segs, (w, b) * L, gv, gj]  inputs
         + [*dv_segs, *dj_segs, (dw, db) * L]      outputs
    """
    n_seg = len(widths)
    n_j = sum(has_j)
    n_layers = len(layout)
    v_refs = refs[:n_seg]
    j_refs = refs[n_seg : n_seg + n_j]
    wb = refs[n_seg + n_j : n_seg + n_j + 2 * n_layers]
    w_refs, b_refs = wb[0::2], wb[1::2]
    gv_ref = refs[n_seg + n_j + 2 * n_layers]
    gj_ref = refs[n_seg + n_j + 2 * n_layers + 1]
    outs = refs[n_seg + n_j + 2 * n_layers + 2 :]
    dv_refs = outs[:n_seg]
    dj_refs = outs[n_seg : n_seg + n_j]
    dwb = outs[n_seg + n_j :]
    dw_refs, db_refs = dwb[0::2], dwb[1::2]

    f, df, ddf = _act_fns(act_name)
    offs = _offsets(widths)
    c0 = widths[0]
    is_first = pl.program_id(0) == 0

    seg_v = [v_refs[i][:] for i in range(n_seg)]
    ji = 0
    seg_j = []
    for i in range(n_seg):
        if has_j[i]:
            seg_j.append([j_refs[ji][a] for a in range(3)])
            ji += 1
        else:
            seg_j.append(None)

    # ---- recompute forward, stashing ONLY pre & jw per layer ----------
    v, j = None, None
    pres, jws = [], []
    for li, split in enumerate(layout):
        w, b = w_refs[li][:], b_refs[li][:]
        if li == 0:
            pre = b
            for i in range(n_seg):
                pre = pre + _mm(seg_v[i], w[offs[i] : offs[i] + widths[i], :])
            jw = [
                sum(
                    _mm(seg_j[i][a], w[offs[i] : offs[i] + widths[i], :])
                    for i in range(n_seg)
                    if seg_j[i] is not None
                )
                for a in range(3)
            ]
        elif split:
            we, wh = w[:c0, :], w[c0:, :]
            pre = _mm(seg_v[0], we) + _mm(v, wh) + b
            jw = [_mm(seg_j[0][a], we) + _mm(j[a], wh) for a in range(3)]
        else:
            pre = _mm(v, w) + b
            jw = [_mm(j[a], w) for a in range(3)]
        pres.append(pre)
        jws.append(jw)
        d = df(pre)
        v = f(pre)
        j = [d * jw[a] for a in range(3)]

    # ---- reverse pass --------------------------------------------------
    gv = gv_ref[:].astype(jnp.float32)
    gj = [gj_ref[a].astype(jnp.float32) for a in range(3)]
    # accumulators for segment-0 grads contributed by skip layers
    g_skip_v = jnp.zeros((seg_v[0].shape[0], c0), jnp.float32)
    g_skip_j = [jnp.zeros((seg_v[0].shape[0], c0), jnp.float32) for _ in range(3)]

    for li in reversed(range(n_layers)):
        split = layout[li]
        w = w_refs[li][:]
        pre, jw = pres[li], jws[li]
        if li == 0:
            v_in, j_in = None, None  # handled via segments below
        elif li == 1:
            # layer 0's outputs
            d_prev = df(pres[0])
            v_in = f(pres[0])
            j_in = [d_prev * jws[0][a] for a in range(3)]
        else:
            prev_pre = pres[li - 1]
            d_prev = df(prev_pre)
            v_in = f(prev_pre)
            j_in = [d_prev * jws[li - 1][a] for a in range(3)]
        d1 = df(pre)
        d2 = ddf(pre)
        gpre = gv * d1 + d2 * (gj[0] * jw[0] + gj[1] * jw[1] + gj[2] * jw[2])
        gjw = [gj[a] * d1 for a in range(3)]
        db = jnp.sum(gpre, axis=0)

        if li == 0:
            # distribute to segments; dW rows per segment
            dw_blocks = []
            for i in range(n_seg):
                wi = w[offs[i] : offs[i] + widths[i], :]
                dv_i = _mm(gpre, wi.T)
                dwi = _mm(seg_v[i].T, gpre)
                if seg_j[i] is not None:
                    dj_i = [_mm(gjw[a], wi.T) for a in range(3)]
                    for a in range(3):
                        dwi = dwi + _mm(seg_j[i][a].T, gjw[a])
                else:
                    dj_i = None
                if i == 0:
                    dv_i = dv_i + g_skip_v
                    if dj_i is not None:
                        dj_i = [dj_i[a] + g_skip_j[a] for a in range(3)]
                dv_refs[i][:] = dv_i
                if dj_i is not None:
                    jidx = sum(1 for k in range(i) if has_j[k])
                    for a in range(3):
                        dj_refs[jidx][a] = dj_i[a]
                dw_blocks.append(dwi)
            dw = jnp.concatenate(dw_blocks, axis=0)
        elif split:
            we_t = w[:c0, :].T
            wh_t = w[c0:, :].T
            g_skip_v = g_skip_v + _mm(gpre, we_t)
            gv = _mm(gpre, wh_t)
            for a in range(3):
                g_skip_j[a] = g_skip_j[a] + _mm(gjw[a], we_t)
            gj = [_mm(gjw[a], wh_t) for a in range(3)]
            dw_top = _mm(seg_v[0].T, gpre)
            dw_bot = _mm(v_in.T, gpre)
            for a in range(3):
                dw_top = dw_top + _mm(seg_j[0][a].T, gjw[a])
                dw_bot = dw_bot + _mm(j_in[a].T, gjw[a])
            dw = jnp.concatenate([dw_top, dw_bot], axis=0)
        else:
            w_t = w.T
            gv_new = _mm(gpre, w_t)
            gj_new = [_mm(gjw[a], w_t) for a in range(3)]
            dw = _mm(v_in.T, gpre)
            for a in range(3):
                dw = dw + _mm(j_in[a].T, gjw[a])
            gv, gj = gv_new, gj_new

        @pl.when(is_first)
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw
            db_refs[li][:] = db

        @pl.when(jnp.logical_not(is_first))
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw_refs[li][:] + dw
            db_refs[li][:] = db_refs[li][:] + db


def _run_backward(vs, js, weights, biases, layout, act_name, has_j, gv, gj,
                  interpret=False):
    m = vs[0].shape[0]
    widths = tuple(v.shape[-1] for v in vs)
    tile = TILE_M_BWD
    grid = (m // tile,)
    n_layers = len(weights)
    c_out = weights[-1].shape[-1]

    in_specs = _seg_specs(widths, has_j, tile, c_out)
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
    in_specs += [
        pl.BlockSpec((tile, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile, c_out), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for w in widths
    ]
    out_shape = [jax.ShapeDtypeStruct((m, w), jnp.float32) for w in widths]
    for w, hj in zip(widths, has_j):
        if hj:
            out_specs.append(
                pl.BlockSpec((3, tile, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((3, m, w), jnp.float32))
    for w in weights:
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_shape.append(jax.ShapeDtypeStruct((w.shape[-1],), jnp.float32))

    args = list(vs) + list(js)
    for w, b in zip(weights, biases):
        args += [w, b]
    args += [gv, gj]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, layout, act_name, has_j, widths),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    n_seg, n_j = len(widths), sum(has_j)
    dvs = tuple(outs[:n_seg])
    djs = tuple(outs[n_seg : n_seg + n_j])
    rest = outs[n_seg + n_j :]
    dws = tuple(rest[0::2])
    dbs = tuple(rest[1::2])
    return dvs, djs, dws, dbs


# ------------------------------------------------------------ public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def dual_mlp_seg(
    vs: Tuple[Array, ...],
    js: Tuple[Array, ...],
    weights: Tuple[Array, ...],
    biases: Tuple[Array, ...],
    layout: Tuple[bool, ...],
    act_name: str,
    has_j: Tuple[bool, ...],
    out_dtype: str = "float32",
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused multi-segment dual-MLP.

    Args:
        vs: per-segment values, each [M, w_i] (M multiple of TILE_M).
            Layer 0 behaves as concat(vs, axis=-1) @ W0.
        js: Jacobian planes [3, M, w_i] for exactly the segments whose
            ``has_j`` flag is True (in order).
        weights / biases: per-layer params. A layer with layout True is
            a post-skip layer re-injecting segment 0 (weight rows
            [w_0 + hidden]).
        layout: per-layer is-post-skip flags (layout[0] ignored).
        act_name: activation for every layer.
        has_j: which segments carry Jacobians.
        out_dtype: dtype of the (v, j) outputs ("float32"/"bfloat16").
        interpret: run the Pallas interpreter (CPU tests).

    Returns:
        (v [M, C_last], j [3, M, C_last]).
    """
    return _run_forward(
        tuple(vs), tuple(js), tuple(weights), tuple(biases), layout, act_name,
        has_j, out_dtype, interpret,
    )


def _seg_fwd(vs, js, weights, biases, layout, act_name, has_j, out_dtype, interpret):
    out = _run_forward(
        tuple(vs), tuple(js), tuple(weights), tuple(biases), layout, act_name,
        has_j, out_dtype, interpret,
    )
    return out, (tuple(vs), tuple(js), tuple(weights), tuple(biases))


def _seg_bwd(layout, act_name, has_j, out_dtype, interpret, res, g):
    vs, js, weights, biases = res
    gv, gj = g
    dvs, djs, dws, dbs = _run_backward(
        vs, js, weights, biases, layout, act_name, has_j,
        gv.astype(jnp.float32), gj.astype(jnp.float32), interpret,
    )
    # cotangents must match primal dtypes (inputs may be bf16)
    dvs = tuple(d.astype(v.dtype) for d, v in zip(dvs, vs))
    djs = tuple(d.astype(j.dtype) for d, j in zip(djs, js))
    dbs = tuple(d.astype(b.dtype) for d, b in zip(dbs, biases))
    dws = tuple(d.astype(w.dtype) for d, w in zip(dws, weights))
    return dvs, djs, dws, dbs


dual_mlp_seg.defvjp(_seg_fwd, _seg_bwd)


def dual_mlp(
    v0: Array,
    j0: Array,
    weights: Tuple[Array, ...],
    biases: Tuple[Array, ...],
    layout: Tuple[bool, ...],
    act_name: str,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Single-segment convenience wrapper (the NeDDF DDF trunk shape)."""
    return dual_mlp_seg(
        (v0,), (j0,), weights, biases, layout, act_name, (True,),
        "float32", interpret,
    )


# ------------------------------------------------------------- helpers
def pad_rows(x: Array, multiple: int = TILE_M, axis: int = 0) -> Tuple[Array, int]:
    """Pad ``axis`` up to a multiple; returns (padded, original_size)."""
    m = x.shape[axis]
    pad = (-m) % multiple
    if pad == 0:
        return x, m
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), m


def dual_pack_to_planes(d: Array) -> Tuple[Array, Array]:
    """[M, 4, C] dual tensor -> (v [M, C], j [3, M, C]) kernel layout."""
    return d[:, 0, :], jnp.moveaxis(d[:, 1:, :], 1, 0)


def planes_to_dual_pack(v: Array, j: Array) -> Array:
    """(v [M, C], j [3, M, C]) -> [M, 4, C] dual tensor."""
    return jnp.concatenate([v[:, None, :], jnp.moveaxis(j, 0, 1)], axis=1)
