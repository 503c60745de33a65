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
* the reference's skip re-concat ``[embed, h]`` (neddf.py:214-219)
  becomes a SPLIT weight: rows [:C0] multiply the embed tile that is
  already resident, rows [C0:] multiply the hidden state — no concat
  materialisation
* backward is a second kernel that RECOMPUTES the forward per tile
  (activations never touch HBM in either direction) and accumulates
  dW/db across the sequential TPU grid; it hand-implements the dual
  chain rule including the f'' coupling the reference writes by hand
  in its custom backwards (e.g. with_grad/softplus.py:83-89)

Both kernels are exposed through ``dual_mlp`` with a jax.custom_vjp, so
reverse-over-forward (loss gradients THROUGH the Jacobian-derived
density) works exactly like the jnp path in neddf_tpu.ops.dual.
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


# -------------------------------------------------------------- forward
def _fwd_kernel(layout, act_name, *refs):
    """Forward: refs = [v0, j0, (w, b) * L] inputs + [v_out, j_out] outputs."""
    n_layers = len(layout)
    v0_ref, j0_ref = refs[0], refs[1]
    w_refs = refs[2 : 2 + 2 * n_layers : 2]
    b_refs = refs[3 : 2 + 2 * n_layers : 2]
    vo_ref, jo_ref = refs[2 + 2 * n_layers], refs[3 + 2 * n_layers]

    f, df, _ = _act_fns(act_name)
    c0 = v0_ref.shape[-1]

    emb_v = v0_ref[:]
    emb_j = [j0_ref[a] for a in range(3)]
    v, j = emb_v, list(emb_j)
    for li, split in enumerate(layout):
        w, b = w_refs[li][:], b_refs[li][:]
        if split:
            # post-skip layer: input was concat([embed, h]); split the
            # weight rows instead of materialising the concat
            we, wh = w[:c0, :], w[c0:, :]
            pre = _mm(emb_v, we) + _mm(v, wh) + b
            jw = [_mm(emb_j[a], we) + _mm(j[a], wh) for a in range(3)]
        else:
            pre = _mm(v, w) + b
            jw = [_mm(j[a], w) for a in range(3)]
        d = df(pre)
        v = f(pre)
        j = [d * jw[a] for a in range(3)]
    vo_ref[:] = v
    for a in range(3):
        jo_ref[a] = j[a]


def _run_forward(
    v0: Array,
    j0: Array,
    weights: Tuple[Array, ...],
    biases: Tuple[Array, ...],
    layout: Tuple[bool, ...],
    act_name: str,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    m, c0 = v0.shape
    c_out = weights[-1].shape[-1]
    grid = (m // TILE_M,)

    in_specs = [
        pl.BlockSpec((TILE_M, c0), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, TILE_M, c0), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
    out_specs = [
        pl.BlockSpec((TILE_M, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, TILE_M, c_out), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    args = [v0, j0]
    for w, b in zip(weights, biases):
        args += [w, b]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, layout, act_name),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((m, c_out), jnp.float32),
            jax.ShapeDtypeStruct((3, m, c_out), jnp.float32),
        ],
        interpret=interpret,
    )(*args)


# ------------------------------------------------------------- backward
def _bwd_kernel(layout, act_name, *refs):
    """Backward: recompute forward, then reverse the dual chain rule.

    refs = [v0, j0, (w, b) * L, gv_out, gj_out]  inputs
         + [dv0, dj0, (dw, db) * L]              outputs
    """
    n_layers = len(layout)
    v0_ref, j0_ref = refs[0], refs[1]
    w_refs = refs[2 : 2 + 2 * n_layers : 2]
    b_refs = refs[3 : 2 + 2 * n_layers : 2]
    gv_ref = refs[2 + 2 * n_layers]
    gj_ref = refs[3 + 2 * n_layers]
    out0 = 4 + 2 * n_layers
    dv0_ref, dj0_ref = refs[out0], refs[out0 + 1]
    dw_refs = refs[out0 + 2 : out0 + 2 + 2 * n_layers : 2]
    db_refs = refs[out0 + 3 : out0 + 2 + 2 * n_layers : 2]

    f, df, ddf = _act_fns(act_name)
    c0 = v0_ref.shape[-1]
    is_first = pl.program_id(0) == 0

    # ---- recompute forward, stashing ONLY pre & jw per layer (layer
    # inputs are recomputed elementwise in the reverse loop — halves the
    # VMEM stash vs also keeping v_in/j_in) ------------------------------
    emb_v = v0_ref[:]
    emb_j = [j0_ref[a] for a in range(3)]
    v, j = emb_v, list(emb_j)
    pres, jws = [], []
    for li, split in enumerate(layout):
        w, b = w_refs[li][:], b_refs[li][:]
        if split:
            we, wh = w[:c0, :], w[c0:, :]
            pre = _mm(emb_v, we) + _mm(v, wh) + b
            jw = [_mm(emb_j[a], we) + _mm(j[a], wh) for a in range(3)]
        else:
            pre = _mm(v, w) + b
            jw = [_mm(j[a], w) for a in range(3)]
        pres.append(pre)
        jws.append(jw)
        d = df(pre)
        v = f(pre)
        j = [d * jw[a] for a in range(3)]

    # ---- reverse pass ---------------------------------------------------
    gv = gv_ref[:]
    gj = [gj_ref[a] for a in range(3)]
    g_emb_v = jnp.zeros_like(emb_v)
    g_emb_j = [jnp.zeros_like(emb_v) for _ in range(3)]
    for li in reversed(range(n_layers)):
        split = layout[li]
        w = w_refs[li][:]
        pre, jw = pres[li], jws[li]
        if li == 0:
            v_in, j_in = emb_v, emb_j
        else:
            prev_pre = pres[li - 1]
            d_prev = df(prev_pre)
            v_in = f(prev_pre)
            j_in = [d_prev * jws[li - 1][a] for a in range(3)]
        d1 = df(pre)
        d2 = ddf(pre)
        # pre receives grad from value AND from every tangent's d1 factor
        gpre = gv * d1 + d2 * (gj[0] * jw[0] + gj[1] * jw[1] + gj[2] * jw[2])
        gjw = [gj[a] * d1 for a in range(3)]

        if split:
            we_t = w[:c0, :].T
            wh_t = w[c0:, :].T
            g_emb_v = g_emb_v + _mm(gpre, we_t)
            gv = _mm(gpre, wh_t)
            for a in range(3):
                g_emb_j[a] = g_emb_j[a] + _mm(gjw[a], we_t)
            gj = [_mm(gjw[a], wh_t) for a in range(3)]
            # weight grad: top rows from embed, bottom rows from hidden
            dw_top = _mm(emb_v.T, gpre)
            dw_bot = _mm(v_in.T, gpre)
            for a in range(3):
                dw_top = dw_top + _mm(emb_j[a].T, gjw[a])
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
        db = jnp.sum(gpre, axis=0)

        @pl.when(is_first)
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw
            db_refs[li][:] = db

        @pl.when(jnp.logical_not(is_first))
        def _(li=li, dw=dw, db=db):
            dw_refs[li][:] = dw_refs[li][:] + dw
            db_refs[li][:] = db_refs[li][:] + db

    dv0_ref[:] = gv + g_emb_v
    for a in range(3):
        dj0_ref[a] = gj[a] + g_emb_j[a]


def _run_backward(
    v0, j0, weights, biases, layout, act_name, gv, gj, interpret=False
):
    m, c0 = v0.shape
    tile = TILE_M_BWD
    grid = (m // tile,)
    n_layers = len(weights)
    c_out = weights[-1].shape[-1]

    in_specs = [
        pl.BlockSpec((tile, c0), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile, c0), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
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
        pl.BlockSpec((tile, c0), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile, c0), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, c0), jnp.float32),
        jax.ShapeDtypeStruct((3, m, c0), jnp.float32),
    ]
    for w in weights:
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_specs.append(
            pl.BlockSpec((w.shape[-1],), lambda i: (0,), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_shape.append(jax.ShapeDtypeStruct((w.shape[-1],), jnp.float32))

    args = [v0, j0]
    for w, b in zip(weights, biases):
        args += [w, b]
    args += [gv, gj]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, layout, act_name),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    dv0, dj0 = outs[0], outs[1]
    dws = tuple(outs[2 + 2 * i] for i in range(n_layers))
    dbs = tuple(outs[3 + 2 * i] for i in range(n_layers))
    return dv0, dj0, dws, dbs


# ------------------------------------------------------------ public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def dual_mlp(
    v0: Array,
    j0: Array,
    weights: Tuple[Array, ...],
    biases: Tuple[Array, ...],
    layout: Tuple[bool, ...],
    act_name: str,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused dual-MLP trunk.

    Args:
        v0: [M, C0] input values (M must be a multiple of TILE_M — use
            ``pad_rows``/``unpad_rows`` helpers).
        j0: [3, M, C0] input Jacobian planes.
        weights / biases: per-layer parameters; a layer marked True in
            ``layout`` is a post-skip layer whose weight has
            ``C0 + C_hidden`` rows (embed rows first, matching the
            reference's concat([embed, h]) ordering).
        layout: per-layer is-post-skip flags.
        act_name: activation for every layer ("tanhExp" etc.).
        interpret: run the Pallas interpreter (CPU tests).

    Returns:
        (v [M, C_last], j [3, M, C_last]) float32.
    """
    return _run_forward(v0, j0, tuple(weights), tuple(biases), layout, act_name, interpret)


def _dual_mlp_fwd(v0, j0, weights, biases, layout, act_name, interpret):
    out = _run_forward(v0, j0, tuple(weights), tuple(biases), layout, act_name, interpret)
    return out, (v0, j0, tuple(weights), tuple(biases))


def _dual_mlp_bwd(layout, act_name, interpret, res, g):
    v0, j0, weights, biases = res
    gv, gj = g
    dv0, dj0, dws, dbs = _run_backward(
        v0, j0, weights, biases, layout, act_name,
        gv.astype(jnp.float32), gj.astype(jnp.float32), interpret,
    )
    return dv0, dj0, dws, dbs


dual_mlp.defvjp(_dual_mlp_fwd, _dual_mlp_bwd)


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
