"""Fused dual-tensor MLP Pallas kernel (the NeDDF hot loop).

The NeDDF distance-field trunk propagates (value, d/dxyz-Jacobian) pairs
through 7+ dense layers (reference: neddf/network/neddf.py:214-219 on
top of neddf/nn_module/with_grad/linear.py). As plain XLA this writes
every [M, 4, 256] dual activation to HBM between layers — at the
flagship shapes (M ~ 1.3e5 samples/step) that is gigabytes of traffic
per step and dominates the step time. This kernel runs the ENTIRE trunk
for a tile of samples inside VMEM:

* value stream   v [M, C]      — one row per sample
* tangent stream j [K, M, C]   — derivative planes; the activation
  chain rule is a clean 2D broadcast per plane (no sublane reshuffles).
  K is inferred from the ``js`` leading dim: K=3 carries the full
  d/dxyz Jacobian (the DDF trunk), K=1 carries one directional
  derivative (the color branch's JVP along grad D — half the streams
  of the full Jacobian it replaced)
* matmuls run on the MXU in bfloat16 with float32 accumulation; the
  pre-activations (which feed f' and f'') stay float32
* the FIRST layer takes multiple input SEGMENTS: concat([a, b, c]) @ W
  is computed as a @ W[ra] + b @ W[rb] + c @ W[rc] with the row slices
  resident in VMEM — no concat is ever materialised. Segments without a
  Jacobian (e.g. NeDDF's PE(dir) / stop-grad normal inputs,
  neddf.py:243-257) skip the tangent matmuls entirely.
* the reference's skip re-concat ``[embed, h]`` (neddf.py:214-219) uses
  the same split-weight trick, re-injecting segment 0.
* backward is a second kernel that hand-implements the dual chain rule
  including the f'' coupling the reference writes by hand in its custom
  backwards (e.g. with_grad/softplus.py:83-89), accumulating dW/db
  across the sequential TPU grid. Its dW / dx products are expressed as
  dot_general with TRANSPOSED CONTRACTING DIMS (``_mm_tn``/``_mm_nt``)
  — materialising ``.T`` operands in-kernel spends VPU shuffles per
  layer per tile (measured ~0.45 ms/step across the flagship's four
  backwards). Under a differentiated call the
  forward streams its per-layer pre-activation stacks to HBM and the
  backward reads them back (_BWD_STASH, default); A/B on v5e-1:
  21.6k rays/s stashed vs 20.8k with the per-tile recompute variant,
  which remains available via ``bwd_stash(False)``. ``stash_stride``
  selects a gradient-checkpointing middle ground (stash every s-th
  layer, recompute the rest) — measured SLOWER at the flagship shapes
  (the full stash overlaps MXU work) but available for
  memory-constrained configs.
* segments can be marked as PE segments (``pe`` descriptor): the kernel
  then takes RAW positions/variance/seeds and expands the encoding
  in VMEM — verified bitwise vs the XLA-side path, but measured SLOWER
  on v5e (ships off; see fields/neddf.py::_PE_IN_KERNEL for the A/B
  and the vreg-occupancy explanation).

Exposed through ``dual_mlp_seg`` (multi-segment) and the single-segment
convenience wrapper ``dual_mlp``, both with jax.custom_vjp so
reverse-over-forward (loss gradients THROUGH the Jacobian-derived
density) works exactly like the jnp path in neddf_tpu.ops.dual.

NEGATIVE RESULT (measured, do not retry): fusing the k<=3-wide output
heads (distance/aux/color out layers) INTO these kernels loses ~25%
end-to-end — as MXU matmuls the N=k passes idle 125+ of 128 output
lanes per tile; as VPU multiply+lane-reduces they serialize against
the MXU. XLA's glue handles the [M,256]x[256,k] heads in one fused
pass over the feature planes, which is faster than anything per-tile.

KNOWN LIMIT: verified correct (vs the jnp path, forward and gradients)
up to M ≈ 4e5 rows per call on v5e; NeDDF chunks larger batches into
<= 393216-row calls. Independently of kernel call size, the WHOLE
grad-compiled render program at train batch 4096 rays x 194 samples
deterministically produces NaNs on ~14% of (early) rays in BOTH f32
and bf16 while the identical forward-only program is clean — the
pattern (contiguous early-ray block, onset mid-ray, unchanged across
two kernel rewrites and with chunked calls) indicates an XLA-level
miscompile at that program scale, not a kernel defect. All shipping
configs (batch <= 1024 rays, render chunks <= 1024) are unaffected;
B = 2048 is verified clean end-to-end (re-verified with the stashed
backward). MITIGATION: the trainer's ``grad_accum`` option
(training/trainer.py) microbatches the grad program under lax.scan —
B = 4096 with grad_accum = 4 is verified NaN-free on v5e (loss
decreasing, zero non-finite rays/grads over multiple steps, re-verified
with the stashed backward) while remaining numerically equivalent to
the monolithic step. Note the stashed backward also changes the
monolithic-B=4096 failure mode: its pre-activation residuals put that
program at ~31GB of HBM, so it now fails loudly at compile time (OOM)
instead of silently mis-running; grad_accum (or ``bwd_stash(False)``)
is the path for such batch sizes either way.
STATUS 2026-08-19 (minimized standalone repro: tools/repro_grad_nan.py):
after the between-rounds toolchain refresh the silent-NaN mode no
longer reproduces — the recompute-backward monolithic grad program is
CLEAN at B = 1024/2048/3072/4096 in bf16 on both schedules, while the
stash-backward B=4096 compile-OOM persists. The trainer guard therefore
stays (it is what keeps default-config microbatches compilable); re-run
the repro sweep on every toolchain update.
SIBLING FAILURE (2026-08-20, bisected live on v5e): the monolithic grad
program that ALSO differentiates w.r.t. the camera-pose deltas
(trainer.optimize_camera=true — loss gradients flow through ray
origins/directions into these kernels' dx/dseed/dvar outputs) CRASHES
the TPU worker ("kernel fault") at the flagship scale (B=512 x 259
samples). Deterministic across four launches; invariant to the
epilogue and stash trace-time toggles; absent on the jnp field path
(network.fused="off") and absent under lax.scan microbatching
(grad_accum=2) — the kernels compute identical outputs in all these
programs, so this is again an XLA program-level fault, not a kernel
defect. The trainer auto-raises grad_accum to 2 when optimize_camera
is set (trainer.py guard), which is numerically equivalent.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# samples per forward grid step (fastest in the v5e sweep; 1024 re-swept
# with stash: 21.5k vs 21.9k)
TILE_M = 512
# backward recomputes + stashes per-layer tensors in VMEM, so it uses a
# smaller tile to stay under the ~16MB scoped-VMEM budget. In bf16
# production mode the stash is bf16 (half the VMEM), which affords a
# 2x tile; f32 exactness mode keeps the f32 stash and the small tile.
TILE_M_BWD = 128
TILE_M_BWD_BF16 = 512  # peaks ~16-18MB scoped VMEM (limit raised below);
# measured fastest on v5e (256: 19.8k rays/s, 512: 20.6k, 1024: 20.0k)


def _bwd_tile() -> int:
    return TILE_M_BWD_BF16 if _MM_DTYPE[0] == jnp.bfloat16 else TILE_M_BWD


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
    if name == "Sigmoid":
        def f(x):
            return jax.nn.sigmoid(x)

        def df(x):
            s = jax.nn.sigmoid(x)
            return s * (1.0 - s)

        def ddf(x):
            s = jax.nn.sigmoid(x)
            return s * (1.0 - s) * (1.0 - 2.0 * s)

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


def _mm_tn(a: Array, b: Array) -> Array:
    """a.T @ b without materializing the transpose (contract dim 0/0).

    Mosaic feeds the MXU directly from the transposed-operand access
    pattern; an explicit ``a.T`` would spend VPU lane/sublane shuffles
    on a [4T, C] block per layer per grid step."""
    dt = _MM_DTYPE[0]
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_nt(a: Array, b: Array) -> Array:
    """a @ b.T without materializing the transpose (contract dim 1/1)."""
    dt = _MM_DTYPE[0]
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
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
#
# STACKED-STREAM layout: inside the kernel the value row-block and the 3
# tangent row-blocks are concatenated into one [4T, C] matrix so every
# layer is ONE large MXU matmul instead of 4 small ones (and backward's
# dW / dX are one [C,4T]x[4T,C] / [4T,C]x[C,C'] each). Rows [0:T] are
# values, rows [(1+a)T:(2+a)T] are the d/dx_a tangent planes.


def _stack_segment(v, j_list, tile, n_tan=3):
    """[T, w] + Kx[T, w] (or None) -> [(K+1)T, w] stacked streams."""
    if j_list is None:
        z = jnp.zeros_like(v)
        return jnp.concatenate([v] + [z] * n_tan, axis=0)
    return jnp.concatenate([v, *j_list], axis=0)


def _dual_act(pre_stack, tile, f, df):
    """Activation on a stacked pre-activation: values get f, tangent
    blocks get df(value) broadcast (the dual chain rule). Generic over
    the tangent-plane count K = rows/tile - 1 (K=3 for the NeDDF trunk,
    K=1 for the directional color JVP)."""
    n_tan = pre_stack.shape[0] // tile - 1
    pre_v = pre_stack[:tile]
    d = df(pre_v)
    return jnp.concatenate(
        [f(pre_v)]
        + [d * pre_stack[(1 + a) * tile : (2 + a) * tile] for a in range(n_tan)],
        axis=0,
    )


# ------------------------------------------------------ in-kernel PE
#
# A PE segment arrives as RAW per-sample geometry (x [T, D], optionally
# the mip variance [T, D] and a K-seed [K, T, D]) plus a tiny constant
# scale row, and is expanded to the [*, 2*D*rank] encoding INSIDE the
# kernel. This removes the XLA-side PE chain entirely — at the flagship
# shapes ~2 ms/step of lane-padded [M,30]/[M,60] fusions, layout copies
# and bf16 converts (every such array uses <=60 of 128 lanes, so each
# op pays >2x its true bandwidth). The math matches ops/pe.py /
# ops/dual.py::pe_dual_planes / pe_dual_directional bitwise in f32.
#
# Descriptor per segment: None (regular) or a tuple
#   (kind, rank, has_crow, has_var) with kind in:
#   "id"    — tangent planes = identity-seeded PE Jacobian (n_tan == D;
#             no js entry; the trunk's PE-with-grad input)
#   "dir"   — K tangent planes seeded by js[i] [K, T, D] (the color
#             branch's directional JVP)
#   "plain" — value-only PE (has_j[i] must be False; e.g. PE(dir))
# has_crow / has_var flag the presence of the per-segment aux arrays in
# ``pe_aux``: crow [1, D*rank] (the traced lowpass/grad-scale product)
# and var [T, D] (mip variance -> in-kernel pe_weights).


def _pe_ref_j(pe_i, has_j_i) -> bool:
    """Does segment i consume an entry of ``js``?"""
    return bool(has_j_i) and (pe_i is None or pe_i[0] == "dir")


def _pe_width(pe_i, raw_width: int) -> int:
    if pe_i is None:
        return raw_width
    _, rank, _, _ = pe_i
    return 2 * raw_width * rank


def _pe_trig(x, rank):
    """Phases + trig in the reference (t, i) channel layout."""
    sub = [x * np.float32(2.0**t) for t in range(rank)]
    p = sub[0] if rank == 1 else jnp.concatenate(sub, axis=-1)  # [T, DR]
    return jnp.sin(p), jnp.cos(p)


# Channel-index helpers — built from iota INSIDE the kernel (Pallas
# rejects captured array constants; scalar constants are fine).
def _pe_chan(rank, d):
    """(f_rep [1, DR], axis_idx [1, DR]) in the (t, i) channel layout."""
    k = jax.lax.broadcasted_iota(jnp.int32, (1, rank * d), 1)
    f_rep = jnp.exp2((k // d).astype(jnp.float32))  # exact powers of two
    return f_rep, k % d


def _pe_selmat(rank, d):
    """[DR, D] channel->axis summing matrix."""
    k = jax.lax.broadcasted_iota(jnp.int32, (rank * d, d), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (rank * d, d), 1)
    return ((k % d) == i).astype(jnp.float32)


def _pe_scale(crow, var, rank, d):
    """Total per-sample scale s = crow * exp(-0.5 f^2 var_i), [*, DR]."""
    w_mip = None
    if var is not None:
        varf = var.astype(jnp.float32)
        blocks = [varf * np.float32(-0.5 * 4.0**t) for t in range(rank)]
        cat = blocks[0] if rank == 1 else jnp.concatenate(blocks, axis=-1)
        w_mip = jnp.exp(cat)  # [T, DR]
    if crow is None:
        return w_mip, w_mip
    c = crow.astype(jnp.float32)
    s = c if w_mip is None else c * w_mip
    return s, w_mip


def _pe_expand(x, rank, crow, var, seeds, n_tan, kind):
    """Expand a PE segment to its stacked dual [(K+1)T, 2DR] (or value-
    only [T, 2DR]). Returns (stacked_or_value, cache) where cache holds
    the trig/scale intermediates the backward chain reuses."""
    xf = x.astype(jnp.float32)
    d = x.shape[-1]
    sin_p, cos_p = _pe_trig(xf, rank)
    s, w_mip = _pe_scale(crow, var, rank, d)
    f_rep, axis_idx = _pe_chan(rank, d)
    if s is None:
        val = jnp.concatenate([sin_p, cos_p], axis=-1)
    else:
        val = jnp.concatenate([s * sin_p, s * cos_p], axis=-1)
    cache = dict(sin_p=sin_p, cos_p=cos_p, s=s, w_mip=w_mip, f_rep=f_rep,
                 axis_idx=axis_idx, rank=rank, d=d, kind=kind)
    if kind == "plain":
        return val, cache
    sf = 1.0 if s is None else s
    g_sin = sf * f_rep * cos_p  # [T, DR] d(sin half)/d(phase-own-axis)
    g_cos = -(sf * f_rep) * sin_p
    if kind == "id":
        # plane a keeps only channels whose input axis is a
        planes = []
        for a in range(n_tan):
            mask = (axis_idx == a).astype(jnp.float32)
            planes.append(
                jnp.concatenate([mask * g_sin, mask * g_cos], axis=-1)
            )
        cache["g_sin"], cache["g_cos"] = g_sin, g_cos
        return jnp.concatenate([val] + planes, axis=0), cache
    # "dir": seeds [K, T, D] -> channel-wise multiply by the tiled seed
    planes = []
    u_chs = []
    for k in range(n_tan):
        u = seeds[k].astype(jnp.float32)
        u_ch = u if rank == 1 else jnp.concatenate([u] * rank, axis=-1)
        u_chs.append(u_ch)
        planes.append(
            jnp.concatenate([g_sin * u_ch, g_cos * u_ch], axis=-1)
        )
    cache["g_sin"], cache["g_cos"] = g_sin, g_cos
    cache["u_chs"] = u_chs
    return jnp.concatenate([val] + planes, axis=0), cache


def _pe_backward(d_in, cache, tile, n_tan):
    """Chain layer-0 cotangents of an expanded PE segment back to
    (dx [T,D], dcrow_part [1,DR] or None, dvar [T,D] or None,
    dseeds [K,T,D] or None). ``d_in`` is [(K+1)T, 2DR] ([T, 2DR] for
    value-only)."""
    sin_p, cos_p = cache["sin_p"], cache["cos_p"]
    s, w_mip, f_rep = cache["s"], cache["w_mip"], cache["f_rep"]
    axis_idx = cache["axis_idx"]
    rank, d, kind = cache["rank"], cache["d"], cache["kind"]
    dr = rank * d
    dv = d_in[:tile]
    dv_s, dv_c = dv[:, :dr], dv[:, dr:]
    # value rows: v = s*(sin, cos)
    dS = dv_s * sin_p + dv_c * cos_p  # d/ds
    sf = 1.0 if s is None else s
    dP = sf * (dv_s * cos_p - dv_c * sin_p)  # d/dphase
    dseeds = None
    sel = _pe_selmat(rank, d)
    if kind == "id":
        for a in range(n_tan):
            mask = (axis_idx == a).astype(jnp.float32)
            dj = d_in[(1 + a) * tile : (2 + a) * tile]
            A, B = mask * dj[:, :dr], mask * dj[:, dr:]
            # j_a = mask*(s*f*cos, -(s*f)*sin)
            dS = dS + f_rep * (A * cos_p - B * sin_p)
            dP = dP - sf * f_rep * (A * sin_p + B * cos_p)
    elif kind == "dir":
        dseeds = []
        for k in range(n_tan):
            u_ch = cache["u_chs"][k]
            dj = d_in[(1 + k) * tile : (2 + k) * tile]
            A, B = dj[:, :dr], dj[:, dr:]
            du_ch = f_rep * (A * cos_p - B * sin_p)
            dS = dS + u_ch * du_ch
            dP = dP - sf * f_rep * u_ch * (A * sin_p + B * cos_p)
            # du_ch w.r.t. the raw seed includes the s factor (dS above
            # used the un-s form because s multiplies once in
            # j = u_ch*s*f*(...))
            dseeds.append(
                jax.lax.dot(sf * du_ch, sel,
                            preferred_element_type=jnp.float32)
            )
    dx = jax.lax.dot(dP * f_rep, sel, preferred_element_type=jnp.float32)
    dcrow = None
    if cache.get("need_crow"):
        dcrow = dS if w_mip is None else dS * w_mip
    dvar = None
    if w_mip is not None and cache.get("need_var"):
        dvar = jax.lax.dot(
            dS * sf * (-0.5 * f_rep * f_rep), sel,
            preferred_element_type=jnp.float32,
        )
    return dx, dcrow, dvar, dseeds


def _build_segments(pe, has_j, v_refs, j_refs, aux_refs, n_tan, tile):
    """Materialise per-segment VMEM inputs: ``seg[i]`` stacked
    [(K+1)T, w_eff] for J-carrying segments (None otherwise), ``segv[i]``
    the value row [T, w_eff] for value-only segments (None otherwise),
    and per-PE-segment trig caches for the backward chain."""
    n_seg = len(has_j)
    seg, segv, caches = [], [], []
    ji = ai = 0
    for i in range(n_seg):
        pe_i = pe[i]
        if pe_i is None:
            caches.append(None)
            if has_j[i]:
                seg.append(
                    _stack_segment(
                        v_refs[i][:], [j_refs[ji][a] for a in range(n_tan)],
                        tile,
                    )
                )
                segv.append(None)
                ji += 1
            else:
                seg.append(None)
                segv.append(v_refs[i][:])
            continue
        kind, rank, has_crow, has_var = pe_i
        crow = var = None
        if has_crow:
            crow = aux_refs[ai][:]
            ai += 1
        if has_var:
            var = aux_refs[ai][:]
            ai += 1
        seeds = None
        if kind == "dir":
            seeds = [j_refs[ji][a] for a in range(n_tan)]
            ji += 1
        out, cache = _pe_expand(
            v_refs[i][:], rank, crow, var, seeds, n_tan, kind
        )
        cache["need_crow"], cache["need_var"] = has_crow, has_var
        caches.append(cache)
        if kind == "plain":
            seg.append(None)
            segv.append(out)
        else:
            seg.append(out)
            segv.append(None)
    return seg, segv, caches


def _fwd_kernel(layout, act_name, has_j, widths, out_dtype, stash_map,
                n_tan, pe, n_aux, *refs):
    """refs = [*v_segs, *j_segs, *pe_aux, (w, b) * L] in
         + [v_out, j_out] out
    (+ pre-activation stash outs [4, T, C_li] for the layers flagged in
    ``stash_map`` — consumed by the no-recompute backward).
    ``widths`` are the EFFECTIVE (post-PE-expansion) segment widths."""
    n_seg = len(widths)
    n_j = sum(_pe_ref_j(pe[i], has_j[i]) for i in range(n_seg))
    n_layers = len(layout)
    v_refs = refs[:n_seg]
    j_refs = refs[n_seg : n_seg + n_j]
    aux_refs = refs[n_seg + n_j : n_seg + n_j + n_aux]
    wb = refs[n_seg + n_j + n_aux : n_seg + n_j + n_aux + 2 * n_layers]
    w_refs, b_refs = wb[0::2], wb[1::2]
    if stash_map is not None:
        n_stash = sum(stash_map)
        vo_ref, jo_ref = refs[-2 - n_stash], refs[-1 - n_stash]
        stash_refs = refs[-n_stash:]
    else:
        vo_ref, jo_ref = refs[-2], refs[-1]
        stash_refs = None

    f, df, _ = _act_fns(act_name)
    offs = _offsets(widths)
    tile = v_refs[0].shape[0]
    seg, segv, _ = _build_segments(
        pe, has_j, v_refs, j_refs, aux_refs, n_tan, tile
    )

    h = None
    c0 = widths[0]
    si = 0
    for li, split in enumerate(layout):
        w, b = w_refs[li][:], b_refs[li][:]
        if li == 0:
            pre = None
            for i in range(n_seg):
                rows = w[offs[i] : offs[i] + widths[i], :]
                if seg[i] is not None:
                    term = _mm(seg[i], rows)  # [4T, C]
                else:
                    vterm = _mm(segv[i], rows)  # [T, C] value-only
                    term = jnp.concatenate(
                        [
                            vterm,
                            jnp.zeros(
                                (n_tan * tile, rows.shape[-1]), vterm.dtype
                            ),
                        ],
                        axis=0,
                    )
                pre = term if pre is None else pre + term
            pre = jnp.concatenate([pre[:tile] + b, pre[tile:]], axis=0)
        elif split:
            # post-skip layer: input was concat([seg0, h]) (neddf.py:214)
            we, wh = w[:c0, :], w[c0:, :]
            pre = _mm(seg[0], we) + _mm(h, wh)
            pre = jnp.concatenate([pre[:tile] + b, pre[tile:]], axis=0)
        else:
            pre = _mm(h, w)
            pre = jnp.concatenate([pre[:tile] + b, pre[tile:]], axis=0)
        if stash_refs is not None and stash_map[li]:
            # identical values to what the recompute backward would
            # rebuild, in the same (matmul) dtype — stash and recompute
            # gradients match exactly. (In bf16 production mode both
            # paths round pre-activations to bf16, a deliberate
            # precision/VMEM trade vs the historical f32-residual
            # recompute; the f32 exactness mode stashes f32.)
            stash_refs[si][:] = pre.astype(_MM_DTYPE[0]).reshape(
                n_tan + 1, tile, pre.shape[-1]
            )
            si += 1
        h = _dual_act(pre, tile, f, df)
    vo_ref[:] = h[:tile].astype(out_dtype)
    for a in range(n_tan):
        jo_ref[a] = h[(1 + a) * tile : (2 + a) * tile].astype(out_dtype)


def _aux_kinds(pe):
    """Flat pe_aux entry kinds ("crow"/"var") from the descriptors —
    the classification must NOT depend on runtime shapes (a degenerate
    one-row batch would make a [1, D] var look like a crow row)."""
    kinds = []
    for pe_i in pe or ():
        if pe_i is None:
            continue
        _, _, has_crow, has_var = pe_i
        if has_crow:
            kinds.append("crow")
        if has_var:
            kinds.append("var")
    return kinds


def _seg_specs(vs, js, pe_aux, tile, n_tan, pe=None):
    """Input block specs for the segment values, explicit tangent
    planes, and PE aux arrays (crow rows [1, DR] are replicated per
    grid step; var arrays [M, D] stream per row-tile)."""
    in_specs = [
        pl.BlockSpec(
            (tile, v.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        for v in vs
    ]
    in_specs += [
        pl.BlockSpec(
            (n_tan, tile, j.shape[-1]), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
        for j in js
    ]
    for a, kind in zip(pe_aux, _aux_kinds(pe)):
        if kind == "crow":
            in_specs.append(
                pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
        else:
            in_specs.append(
                pl.BlockSpec(
                    (tile, a.shape[-1]), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                )
            )
    return in_specs


def _run_forward(vs, js, weights, biases, layout, act_name, has_j, out_dtype,
                 interpret=False, stash_map=None, pe=None, pe_aux=(),
                 n_tan=None):
    m = vs[0].shape[0]
    if m % TILE_M:
        # the grid would silently skip the trailing rows — callers must
        # pad_rows() to a TILE_M multiple
        raise ValueError(f"rows {m} not a multiple of TILE_M={TILE_M}")
    if pe is None:
        pe = (None,) * len(vs)
    widths = tuple(
        _pe_width(p, v.shape[-1]) for p, v in zip(pe, vs)
    )  # effective (post-PE-expansion) widths for the weight-row offsets
    c_out = weights[-1].shape[-1]
    grid = (m // TILE_M,)
    if n_tan is None:
        n_tan = js[0].shape[0] if js else 3

    in_specs = _seg_specs(vs, js, pe_aux, TILE_M, n_tan, pe)
    for w in weights:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
    out_specs = [
        pl.BlockSpec((TILE_M, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (n_tan, TILE_M, c_out), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = list(vs) + list(js) + list(pe_aux)
    for w, b in zip(weights, biases):
        args += [w, b]
    odt = jnp.dtype(out_dtype)
    out_shape = [
        jax.ShapeDtypeStruct((m, c_out), odt),
        jax.ShapeDtypeStruct((n_tan, m, c_out), odt),
    ]
    params = None
    if stash_map is not None:
        sdt = _MM_DTYPE[0]
        for w, st in zip(weights, stash_map):
            if not st:
                continue
            c = w.shape[-1]
            out_specs.append(
                pl.BlockSpec((n_tan + 1, TILE_M, c), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((n_tan + 1, m, c), sdt))
        params = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, layout, act_name, has_j, widths, odt, stash_map,
            n_tan, pe, len(pe_aux),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else params,
    )(*args)
    if stash_map is not None:
        return outs[0], outs[1], tuple(outs[2:])
    return outs


# ------------------------------------------------------------- backward
def _write_pe_aux_grads(daux_refs, ai, cache, dcrow, dvar, is_first):
    """Write a PE segment's aux cotangents: crow grads accumulate
    across the sequential grid (like dW/db), var grads are per-row."""
    if cache["need_crow"]:
        dc = jnp.sum(dcrow, axis=0, keepdims=True)  # [1, DR]
        r = daux_refs[ai]
        ai += 1

        @pl.when(is_first)
        def _(r=r, dc=dc):
            r[:] = dc.astype(r.dtype)

        @pl.when(jnp.logical_not(is_first))
        def _(r=r, dc=dc):
            r[:] = r[:] + dc.astype(r.dtype)

    if cache["need_var"]:
        daux_refs[ai][:] = dvar.astype(daux_refs[ai].dtype)
        ai += 1
    return ai


def _bwd_kernel(layout, act_name, has_j, widths, stash_map, n_tan, pe,
                n_aux, *refs):
    """Reverse the dual chain; per-layer pre-activations either arrive
    from the forward's HBM stash (layers flagged in ``stash_map``) or
    are recomputed in VMEM (the rest; ``stash_map is None`` recomputes
    everything).

    refs = [*v_segs, *j_segs, *pe_aux, (w, b) * L, gv, gj, (*pres)]  in
         + [*dv_segs, *dj_segs, *d_pe_aux, (dw, db) * L]            out

    PE segments re-expand their encodings here (cheap VPU trig per
    tile) and their layer-0 cotangents chain back to the RAW inputs:
    dx [T, D], d(crow) [1, DR] (grid-accumulated), d(var) [T, D],
    d(seeds) [K, T, D]."""
    n_seg = len(widths)
    n_j = sum(_pe_ref_j(pe[i], has_j[i]) for i in range(n_seg))
    n_layers = len(layout)
    n_stash = sum(stash_map) if stash_map is not None else 0
    v_refs = refs[:n_seg]
    j_refs = refs[n_seg : n_seg + n_j]
    aux_refs = refs[n_seg + n_j : n_seg + n_j + n_aux]
    base = n_seg + n_j + n_aux
    wb = refs[base : base + 2 * n_layers]
    w_refs, b_refs = wb[0::2], wb[1::2]
    gv_ref = refs[base + 2 * n_layers]
    gj_ref = refs[base + 2 * n_layers + 1]
    n_in = base + 2 * n_layers + 2
    stash_refs = refs[n_in : n_in + n_stash] if stash_map is not None else None
    outs = refs[n_in + n_stash :]
    dv_refs = outs[:n_seg]
    dj_refs = outs[n_seg : n_seg + n_j]
    daux_refs = outs[n_seg + n_j : n_seg + n_j + n_aux]
    dwb = outs[n_seg + n_j + n_aux :]
    dw_refs, db_refs = dwb[0::2], dwb[1::2]

    f, df, ddf = _act_fns(act_name)
    offs = _offsets(widths)
    c0 = widths[0]
    is_first = pl.program_id(0) == 0
    tile = v_refs[0].shape[0]

    seg, segv, caches = _build_segments(
        pe, has_j, v_refs, j_refs, aux_refs, n_tan, tile
    )

    # ---- pre-activations: read the forward's HBM stash where stashed,
    # recompute the rest in VMEM. Within a run of consecutive
    # recomputed layers the replay chains through the f32 `prev_f32`
    # (exactly like the forward), so the all-recompute path reproduces
    # the all-stash ARITHMETIC exactly (compiled dot reductions may
    # still block differently between program variants -> f32-roundoff
    # deltas, see tests); a recomputed layer that FOLLOWS a
    # stashed one chains from the stash dtype (bf16 in production — the
    # stride>1 hybrid's only additional numeric delta, nil in f32
    # exactness mode).
    stash_dt = _MM_DTYPE[0]
    pres = []
    prev_f32 = None  # f32 pre of layer li-1 iff it was recomputed here
    si = 0
    for li, split in enumerate(layout):
        if stash_map is not None and stash_map[li]:
            r = stash_refs[si]
            si += 1
            pres.append(r[:].reshape((n_tan + 1) * tile, r.shape[-1]))
            prev_f32 = None
            continue
        w, b = w_refs[li][:], b_refs[li][:]
        if li == 0:
            pre = None
            for i in range(n_seg):
                rows = w[offs[i] : offs[i] + widths[i], :]
                if seg[i] is not None:
                    term = _mm(seg[i], rows)
                else:
                    vterm = _mm(segv[i], rows)
                    term = jnp.concatenate(
                        [
                            vterm,
                            jnp.zeros(
                                (n_tan * tile, rows.shape[-1]),
                                vterm.dtype,
                            ),
                        ],
                        axis=0,
                    )
                pre = term if pre is None else pre + term
        else:
            src = (
                prev_f32
                if prev_f32 is not None
                else pres[li - 1].astype(jnp.float32)
            )
            h = _dual_act(src, tile, f, df)
            if split:
                pre = _mm(seg[0], w[:c0, :]) + _mm(h, w[c0:, :])
            else:
                pre = _mm(h, w)
        pre = jnp.concatenate([pre[:tile] + b, pre[tile:]], axis=0)
        pres.append(pre.astype(stash_dt))
        prev_f32 = pre

    # ---- reverse pass --------------------------------------------------
    gv = gv_ref[:].astype(jnp.float32)
    gj = [gj_ref[a].astype(jnp.float32) for a in range(n_tan)]
    # segment-0 grads contributed by skip layers, stacked [(K+1)T, c0]
    g_skip = jnp.zeros(((n_tan + 1) * tile, c0), jnp.float32)

    for li in reversed(range(n_layers)):
        split = layout[li]
        w = w_refs[li][:]
        pre = pres[li].astype(jnp.float32)
        pre_v = pre[:tile]
        d1 = df(pre_v)
        d2 = ddf(pre_v)
        # gpre for the value rows collects the f'' coupling from every
        # tangent plane; tangent rows' grads are gj_a * f'(pre_v)
        coupling = gj[0] * pre[tile : 2 * tile]
        for a in range(1, n_tan):
            coupling = coupling + gj[a] * pre[(1 + a) * tile : (2 + a) * tile]
        gpre_v = gv * d1 + d2 * coupling
        g_stack = jnp.concatenate(
            [gpre_v] + [gj[a] * d1 for a in range(n_tan)], axis=0
        )  # [(K+1)T, C]
        db = jnp.sum(gpre_v, axis=0)

        # input of this layer, stacked (recomputed; activation in f32,
        # the consuming matmul casts back down)
        if li > 0:
            h_in = _dual_act(pres[li - 1].astype(jnp.float32), tile, f, df)

        if li == 0:
            dw_blocks = []
            ai = 0  # running index into daux_refs (order: per-seg crow?, var?)
            for i in range(n_seg):
                rows = w[offs[i] : offs[i] + widths[i], :]
                pe_i = pe[i]
                jidx = sum(
                    1 for k in range(i) if _pe_ref_j(pe[k], has_j[k])
                )
                if seg[i] is not None:
                    d_in = _mm_nt(g_stack, rows)  # [4T, w_eff]
                    if i == 0:
                        d_in = d_in + g_skip
                    dw_blocks.append(_mm_tn(seg[i], g_stack))
                    if pe_i is None:
                        # input cotangents leave in the primal dtype (bf16
                        # in production) — halves the dominant HBM writes
                        dv_refs[i][:] = d_in[:tile].astype(dv_refs[i].dtype)
                        for a in range(n_tan):
                            dj_refs[jidx][a] = d_in[
                                (1 + a) * tile : (2 + a) * tile
                            ].astype(dj_refs[jidx].dtype)
                    else:
                        dx, dcrow, dvar, dseeds = _pe_backward(
                            d_in, caches[i], tile, n_tan
                        )
                        dv_refs[i][:] = dx.astype(dv_refs[i].dtype)
                        if dseeds is not None:
                            for a in range(n_tan):
                                dj_refs[jidx][a] = dseeds[a].astype(
                                    dj_refs[jidx].dtype
                                )
                        ai = _write_pe_aux_grads(
                            daux_refs, ai, caches[i], dcrow, dvar, is_first
                        )
                else:
                    if pe_i is None:
                        dv_refs[i][:] = _mm_nt(gpre_v, rows).astype(
                            dv_refs[i].dtype
                        )
                        dw_blocks.append(_mm_tn(v_refs[i][:], gpre_v))
                    else:
                        d_in = _mm_nt(gpre_v, rows)  # [T, 2DR]
                        dw_blocks.append(_mm_tn(segv[i], gpre_v))
                        dx, dcrow, dvar, _ = _pe_backward(
                            d_in, caches[i], tile, n_tan
                        )
                        dv_refs[i][:] = dx.astype(dv_refs[i].dtype)
                        ai = _write_pe_aux_grads(
                            daux_refs, ai, caches[i], dcrow, dvar, is_first
                        )
            dw = jnp.concatenate(dw_blocks, axis=0)
        elif split:
            g_skip = g_skip + _mm_nt(g_stack, w[:c0, :])
            g_in = _mm_nt(g_stack, w[c0:, :])  # [4T, C_hidden]
            dw = jnp.concatenate(
                [_mm_tn(seg[0], g_stack), _mm_tn(h_in, g_stack)], axis=0
            )
            gv = g_in[:tile]
            gj = [g_in[(1 + a) * tile : (2 + a) * tile] for a in range(n_tan)]
        else:
            g_in = _mm_nt(g_stack, w)
            dw = _mm_tn(h_in, g_stack)
            gv = g_in[:tile]
            gj = [g_in[(1 + a) * tile : (2 + a) * tile] for a in range(n_tan)]

        @pl.when(is_first)
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw
            db_refs[li][:] = db

        @pl.when(jnp.logical_not(is_first))
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw_refs[li][:] + dw
            db_refs[li][:] = db_refs[li][:] + db


def _run_backward(vs, js, weights, biases, layout, act_name, has_j, gv, gj,
                  interpret=False, pres=None, stash_map=None, pe=None,
                  pe_aux=(), n_tan=None):
    m = vs[0].shape[0]
    if pe is None:
        pe = (None,) * len(vs)
    widths = tuple(_pe_width(p, v.shape[-1]) for p, v in zip(pe, vs))
    tile = _bwd_tile()
    grid = (m // tile,)
    n_layers = len(weights)
    c_out = weights[-1].shape[-1]
    if n_tan is None:
        n_tan = js[0].shape[0] if js else 3

    in_specs = _seg_specs(vs, js, pe_aux, tile, n_tan, pe)
    for w in weights:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
    in_specs += [
        pl.BlockSpec((tile, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (n_tan, tile, c_out), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    # dx cotangents in the primal dtype (bf16 halves HBM traffic) and the
    # primal (RAW) widths — a PE segment's cotangent is on its raw
    # [M, D] input, not the expanded encoding; dW/db stay f32 — they
    # are accumulated across the whole grid
    out_specs = [
        pl.BlockSpec(
            (tile, v.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        for v in vs
    ]
    out_shape = [jax.ShapeDtypeStruct((m, v.shape[-1]), v.dtype) for v in vs]
    for j in js:
        out_specs.append(
            pl.BlockSpec(
                (n_tan, tile, j.shape[-1]), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((n_tan, m, j.shape[-1]), j.dtype))
    for a, kind in zip(pe_aux, _aux_kinds(pe)):
        if kind == "crow":  # grid-accumulated [1, DR]
            out_specs.append(
                pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct(a.shape, jnp.float32))
        else:  # var: per-row [M, D]
            out_specs.append(
                pl.BlockSpec(
                    (tile, a.shape[-1]), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shape.append(jax.ShapeDtypeStruct(a.shape, jnp.float32))
    for w in weights:
        out_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_shape.append(jax.ShapeDtypeStruct((w.shape[-1],), jnp.float32))

    args = list(vs) + list(js) + list(pe_aux)
    for w, b in zip(weights, biases):
        args += [w, b]
    args += [gv, gj]
    stashed = pres is not None
    if stashed:
        if stash_map is None:
            stash_map = (True,) * n_layers
        for p in pres:
            in_specs.append(
                pl.BlockSpec(
                    (n_tan + 1, tile, p.shape[-1]), lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        args += list(pres)
    else:
        stash_map = None
    # the 512-row single-segment tile peaks at 16.33MB of scoped VMEM —
    # barely past the 16MB default — and is worth it (bigger MXU tiles,
    # half the grid steps), so raise the per-kernel limit; the stashed
    # variant streams the per-layer pre-activation blocks too
    limit = (48 if stashed else 24) * 1024 * 1024
    params = pltpu.CompilerParams(vmem_limit_bytes=limit)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, layout, act_name, has_j, widths, stash_map, n_tan,
            pe, len(pe_aux),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else params,
    )(*args)
    n_seg, n_j = len(widths), len(js)
    dvs = tuple(outs[:n_seg])
    djs = tuple(outs[n_seg : n_seg + n_j])
    dauxs = tuple(outs[n_seg + n_j : n_seg + n_j + len(pe_aux)])
    rest = outs[n_seg + n_j + len(pe_aux) :]
    dws = tuple(rest[0::2])
    dbs = tuple(rest[1::2])
    return dvs, djs, dauxs, dws, dbs


# ------------------------------------------------------------ public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 10, 11))
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
    pe_aux: Tuple[Array, ...] = (),
    pe: "object | None" = None,
    n_tan: "int | None" = None,
) -> Tuple[Array, Array]:
    """Fused multi-segment dual-MLP.

    Args:
        vs: per-segment values, each [M, w_i] (M multiple of TILE_M).
            Layer 0 behaves as concat(vs, axis=-1) @ W0. For a PE
            segment (see ``pe``) the entry is the RAW input [M, D]
            (positions/directions) and the encoding is expanded inside
            the kernel.
        js: tangent planes [K, M, w_i] for exactly the segments that
            consume one (has_j and not an identity-PE segment, in
            order). For a "dir" PE segment the entry is the RAW
            per-sample tangent seed [K, M, D].
        weights / biases: per-layer params. A layer with layout True is
            a post-skip layer re-injecting segment 0 (weight rows
            [w_0 + hidden]).
        layout: per-layer is-post-skip flags (layout[0] ignored).
        act_name: activation for every layer.
        has_j: which segments carry tangent planes.
        out_dtype: dtype of the (v, j) outputs ("float32"/"bfloat16").
        interpret: run the Pallas interpreter (CPU tests).
        pe_aux: flat tuple of PE aux arrays, per PE segment in order:
            the constant scale row crow [1, D*rank] if flagged, then
            the mip variance var [M, D] if flagged.
        pe: per-segment descriptor, None or (kind, rank, has_crow,
            has_var) with kind in "id" / "dir" / "plain" — see the
            in-kernel-PE comment block. Static.
        n_tan: tangent-plane count K; required when no ``js`` entry
            exists to infer it from (e.g. a lone identity-PE segment).

    Returns:
        (v [M, C_last], j [K, M, C_last]).
    """
    return _run_forward(
        tuple(vs), tuple(js), tuple(weights), tuple(biases), layout, act_name,
        has_j, out_dtype, interpret, pe=pe, pe_aux=tuple(pe_aux), n_tan=n_tan,
    )


# When True, a differentiated dual_mlp_seg's forward writes its per-layer
# pre-activations to HBM and the backward streams them back instead of
# recomputing the forward per tile: backward drops from 3x to 2x forward
# MXU work for ~2GB/step of extra (largely MXU-overlapped) HBM traffic
# at the flagship shapes. Values and dtype match the recompute exactly,
# so numerics are identical either way (stash vs recompute; both store
# pre-activations in the matmul dtype — in bf16 production mode that is
# a deliberate precision/VMEM trade vs an all-f32 residual). The
# un-differentiated (eval) path never stashes.
_BWD_STASH = [True]

# Stash STRIDE: with stride s the forward stashes only layers li % s == 0
# and the backward recomputes each in-between layer from the nearest
# stashed one (one extra dual matmul per skipped layer) — the
# gradient-checkpointing middle ground between all-stash (stride 1,
# max HBM traffic / min MXU) and all-recompute (bwd_stash(False)).
# Read at trace time, same caveat as bwd_stash.
# MEASURED (v5e-1 flagship, same-session A/B): stride 1 / 2 / 3 =
# 19.9 / 20.5 / 20.4 ms per step — the full stash WINS; its HBM
# traffic overlaps MXU work almost completely, so the recompute
# matmuls are a pure add. Stride stays 1; >1 remains available for
# memory-constrained shapes (the stash is the dominant HBM resident
# at large batch, kernels docstring "KNOWN LIMIT").
_STASH_STRIDE = [1]


class stash_stride:
    """Context manager for the stash stride (trace-time, for A/Bs)."""

    def __init__(self, n: int):
        self.n = n

    def __enter__(self):
        self.prev = _STASH_STRIDE[0]
        _STASH_STRIDE[0] = self.n

    def __exit__(self, *exc):
        _STASH_STRIDE[0] = self.prev


def _make_stash_map(n_layers: int):
    if not _BWD_STASH[0]:
        return None
    s = _STASH_STRIDE[0]
    return tuple(li % s == 0 for li in range(n_layers))


class bwd_stash:
    """Context manager toggling the stashed backward (A/B benches).

    TRACE-TIME semantics (same as ``matmul_dtype``): the flag is read
    when a grad program is *traced*, not when it runs. A jit cache
    entry traced under one setting silently keeps that variant after
    the flag changes — for honest A/B numbers, build fresh jitted
    callables (or call ``.clear_cache()``) inside each ``bwd_stash``
    scope rather than reusing one across toggles.
    """

    def __init__(self, on: bool):
        self.on = on

    def __enter__(self):
        self.prev = _BWD_STASH[0]
        _BWD_STASH[0] = self.on

    def __exit__(self, *exc):
        _BWD_STASH[0] = self.prev


def _seg_fwd(vs, js, weights, biases, layout, act_name, has_j, out_dtype,
             interpret, pe_aux=(), pe=None, n_tan=None):
    sm = _make_stash_map(len(weights))
    if sm is not None:
        v, j, pres = _run_forward(
            tuple(vs), tuple(js), tuple(weights), tuple(biases), layout,
            act_name, has_j, out_dtype, interpret, stash_map=sm, pe=pe,
            pe_aux=tuple(pe_aux), n_tan=n_tan,
        )
        # the stash MAP rides in the residual pytree STRUCTURE (dict
        # keys are static), so the backward uses exactly the forward's
        # map even if the trace-time stride/stash flags change between
        # the two traces — no silent mismatch is possible.
        stashed = [li for li in range(len(weights)) if sm[li]]
        pres_dict = {f"{li:03d}": p for li, p in zip(stashed, pres)}
        return (v, j), (
            tuple(vs), tuple(js), tuple(weights), tuple(biases), pres_dict,
            tuple(pe_aux),
        )
    out = _run_forward(
        tuple(vs), tuple(js), tuple(weights), tuple(biases), layout, act_name,
        has_j, out_dtype, interpret, pe=pe, pe_aux=tuple(pe_aux), n_tan=n_tan,
    )
    return out, (
        tuple(vs), tuple(js), tuple(weights), tuple(biases), None,
        tuple(pe_aux),
    )


def _seg_bwd(layout, act_name, has_j, out_dtype, interpret, pe, n_tan,
             res, g):
    vs, js, weights, biases, pres_dict, pe_aux = res
    gv, gj = g
    if pres_dict is not None:
        # reconstruct the forward's stash map from the residual keys
        stashed = sorted(pres_dict)
        sm = tuple(
            f"{li:03d}" in pres_dict for li in range(len(weights))
        )
        pres = tuple(pres_dict[k] for k in stashed)
    else:
        sm, pres = None, None
    # gv/gj enter in the kernel OUTPUT dtype (bf16 in production) and dx
    # cotangents leave in the primal input dtypes — no f32 staging arrays
    # on either side of the kernel; only dW/db (tiny) are f32.
    dvs, djs, dauxs, dws, dbs = _run_backward(
        vs, js, weights, biases, layout, act_name, has_j, gv, gj, interpret,
        pres=pres, stash_map=sm, pe=pe, pe_aux=pe_aux, n_tan=n_tan,
    )
    dbs = tuple(d.astype(b.dtype) for d, b in zip(dbs, biases))
    dws = tuple(d.astype(w.dtype) for d, w in zip(dws, weights))
    dauxs = tuple(d.astype(a.dtype) for d, a in zip(dauxs, pe_aux))
    return dvs, djs, dws, dbs, dauxs


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
