"""Fused NeDDF head/density/penalty epilogue (Pallas).

Consumes the DDF trunk's dual streams ONCE and emits everything the
rest of the step needs — where plain XLA runs a long tail of separate
fusions (head matmuls, casts, reductions, copies) re-streaming the
[3, M, C] Jacobian planes from HBM (profiled at ~7 ms/step of glue at
the flagship shapes; see BASELINE.md):

    inputs   v [M, C], j [3, M, C]   (trunk value/Jacobian streams)
             wd [C, 1], wa [C, 1]    (distance / aux head weights)
             b2 [2]                  (distance | aux biases, SMEM)
             scal [8]                (d_near, aux_grad_scale,
                                      distance_range_max, 4 penalty
                                      weights, pad — SMEM)
    outputs  packed [M, 16] f32      (lane 0 density, 1 distance,
                                      2 aux_grad, 3:6 normalized grad D,
                                      6:9 grad D, 9 penalty sum,
                                      10: zero pad)
             t_feat [M, C]           (directional tangent seed
                                      sum_a j[a] * sg(grad D)[a] for the
                                      K=1 color JVP)

All per-row scalars ride ONE lane-packed [M, 16] array: a f32 [M, 1]
output is tiled T(8,128) in HBM, so each 1-wide column costs the full
512 B/row of a 128-lane tile — twelve separate columns (the first cut
of this kernel) wrote ~9 KB/row of padding against only ~2 KB/row of
real input traffic and measured 7% SLOWER than the XLA glue. Packing
pays that tile tax once. The backward takes the packed cotangent the
same way and RECOMPUTES the two head pre-activations from (v, j)
— which it must stream anyway for the weight grads — instead of
stashing them, so the kernel stores no residuals at all (bitwise
identical recompute: same dot, same operands, same accumulation).

Math and stop_gradient placements mirror fields/neddf.py::apply exactly
(reference neddf/network/neddf.py:220-300): distance = softplus + d_near,
density = relu((1/D)(1 - ||[grad D, aux]||)), penalties
constraints_aux_grad (with its sg(aux)·sg(|gradD|)·sg(D) scale and
sg(1/D) in the 3·aux/D term), constraints_dDdt, range_distance,
range_aux_grad. The hand-written VJP implements the full second-order
chain (sigmoid'/softplus''/sqrt/1/x) with those sg placements;
equivalence to the jnp path is pinned (values AND grads) in
tests/kernels/test_neddf_epilogue.py. The packed lanes carrying norm
and grad D (3:9) have stop-gradient semantics: apply consumes both
only under sg, so the backward ignores their cotangent lanes.

Mosaic shape discipline (v5e toolchain): per-row scalars live as
[T, 1] column vectors inside the kernel (2-D throughout — 1-D vectors
and axis-0 multi_reductions of [3, T] blocks fail to lower); lane
packing/extraction goes through broadcast-iota masks (sums along
lanes), never unaligned lane slices; the 3 tangent planes are UNROLLED
rather than kept as a leading array axis; the two 1-wide heads run as
separate [4T, C] @ [C, 1] matmuls so every per-row quantity is born as
a sublane slice.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neddf_tpu.kernels.dual_mlp import _MM_DTYPE

Array = jax.Array

TILE = 512
PACK_W = 16
_EPS_NORM = 1e-7


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _softplus(x):
    return jax.nn.softplus(x)


def _relu(x):
    return jnp.maximum(x, 0.0)


def _pack_lanes(cols, width):
    """[T, 1] columns -> one [T, width] block, col a in lane a
    (broadcast-iota masks; Mosaic-safe, no lane-slice writes)."""
    tile = cols[0].shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, width), 1)
    out = jnp.zeros((tile, width), jnp.float32)
    for a, c in enumerate(cols):
        out = out + jnp.where(lane == a, c, 0.0)
    return out


def _lane(x, a):
    """Extract lane a of [T, W] as a [T, 1] column (masked lane sum)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.sum(jnp.where(lane == a, x, 0.0), axis=1, keepdims=True)


def _heads(v, j_ref, wd, wa):
    """Two stacked [4T, C] @ [C, 1] head projections -> f32 [4T, 1] ×2
    plus the bf16 stack (reused by t_feat and the weight grads)."""
    dt = _MM_DTYPE[0]
    stack = jnp.concatenate(
        [v, j_ref[0], j_ref[1], j_ref[2]], axis=0
    ).astype(dt)
    h1 = jnp.dot(stack, wd.astype(dt), preferred_element_type=jnp.float32)
    h2 = jnp.dot(stack, wa.astype(dt), preferred_element_type=jnp.float32)
    return h1, h2, stack


def _epilogue_math(h1, h2, b2_ref, scal_ref, tile):
    """Forward math from raw (bias-free) head pre-activations; all
    per-row quantities are [T, 1] columns, tangent planes unrolled."""
    d_near, ags = scal_ref[0], scal_ref[1]
    drmax = scal_ref[2]

    ddf_out = h1[:tile] + b2_ref[0]
    aux_out = h2[:tile] + b2_ref[1]
    hj1 = (h1[tile:2 * tile], h1[2 * tile:3 * tile], h1[3 * tile:])
    hj2 = (h2[tile:2 * tile], h2[2 * tile:3 * tile], h2[3 * tile:])

    spd = _sigmoid(ddf_out)  # softplus'
    distance = _softplus(ddf_out) + d_near
    dg = tuple(spd * hj1[a] for a in range(3))  # grad D components
    sig_a = _sigmoid(aux_out)
    aux = ags * sig_a
    auxd = ags * sig_a * (1.0 - sig_a)  # d aux / d aux_out
    agg = tuple(auxd * hj2[a] for a in range(3))

    grad_sq = dg[0] * dg[0] + dg[1] * dg[1] + dg[2] * dg[2]
    dgn = jnp.sqrt(grad_sq)
    d_ddt = jnp.sqrt(grad_sq + aux * aux)
    dinv = 1.0 / distance
    density = _relu(dinv * (1.0 - d_ddt))
    inv_dgn_eps = 1.0 / (dgn + _EPS_NORM)
    norm = tuple(dg[a] * inv_dgn_eps for a in range(3))

    d2 = agg[0] * norm[0] + agg[1] * norm[1] + agg[2] * norm[2]
    rest = 3.0 * aux * dinv
    ag_scale = aux * dgn * distance  # fully stop-gradiented factor
    w_ag, w_ddt = scal_ref[3], scal_ref[4]
    w_rd, w_ra = scal_ref[5], scal_ref[6]
    p1 = ag_scale * jnp.square(d2 - rest)
    p2 = jnp.square(_relu(d_ddt - 1.0))
    p3 = jnp.square(_relu(-4.6 - ddf_out) + _relu(ddf_out - drmax))
    p4 = jnp.square(_relu(-4.6 - aux_out) + _relu(aux_out - 4.6))
    pen = w_ag * p1 + w_ddt * p2 + w_rd * p3 + w_ra * p4
    return dict(
        ddf_out=ddf_out, aux_out=aux_out, hj1=hj1, hj2=hj2, spd=spd,
        distance=distance, dg=dg, sig_a=sig_a, aux=aux, auxd=auxd,
        agg=agg, dgn=dgn, d_ddt=d_ddt, dinv=dinv, density=density,
        norm=norm, inv_dgn_eps=inv_dgn_eps, d2=d2, rest=rest,
        ag_scale=ag_scale, pen=pen,
    )


def _fwd_kernel(out_dtype, v_ref, j_ref, wd_ref, wa_ref, b2_ref, scal_ref,
                packed_ref, tfeat_ref):
    tile = v_ref.shape[0]
    h1, h2, stack = _heads(v_ref[:], j_ref, wd_ref[:], wa_ref[:])
    m = _epilogue_math(h1, h2, b2_ref, scal_ref, tile)

    dg = m["dg"]
    packed_ref[:] = _pack_lanes(
        [m["density"], m["distance"], m["aux"],
         m["norm"][0], m["norm"][1], m["norm"][2],
         dg[0], dg[1], dg[2], m["pen"]],
        PACK_W,
    )
    # t_feat = sum_a j[a] * sg(grad D[a]) — the K=1 color tangent seed
    # (reuses the stacked bf16 planes already in registers)
    tfeat_ref[:] = (
        stack[tile:2 * tile].astype(jnp.float32) * dg[0]
        + stack[2 * tile:3 * tile].astype(jnp.float32) * dg[1]
        + stack[3 * tile:].astype(jnp.float32) * dg[2]
    ).astype(out_dtype)


def _bwd_kernel(v_ref, j_ref, wd_ref, wa_ref, wdr_ref, war_ref,
                b2_ref, scal_ref, g_packed_ref, g_tfeat_ref,
                dv_ref, dj_ref, dwd_ref, dwa_ref, db2_ref):
    """Hand-written reverse of _epilogue_math + _heads + t_feat.

    Reads only lanes 0/1/2/9 of the packed cotangent — norm and dg
    (lanes 3:9) have NO backward path: their only consumers in apply
    are wrapped in stop_gradient (the color branch's normal segment and
    the directional-tangent direction), matching the reference's sg
    placements. h1/h2 are recomputed from (v, j) — already streamed
    here for the weight grads — instead of stashed (identical dot on
    identical operands, so the recompute is bitwise). The stream
    cotangent and weight grads go through broadcast outer products and
    sublane reductions rather than N=1 MXU matvecs: wdr/war carry the
    head weights pre-transposed to [1, C] so the kernel never
    transposes a [4T, C] block, and dwd/dwa accumulate in [1, C] row
    layout (the host-side wrapper transposes them back once).
    """
    tile = v_ref.shape[0]
    h1, h2, stack = _heads(v_ref[:], j_ref, wd_ref[:], wa_ref[:])
    m = _epilogue_math(h1, h2, b2_ref, scal_ref, tile)
    ags = scal_ref[1]
    drmax = scal_ref[2]
    w_ag, w_ddt = scal_ref[3], scal_ref[4]
    w_rd, w_ra = scal_ref[5], scal_ref[6]

    g_packed = g_packed_ref[:].astype(jnp.float32)
    g_dens = _lane(g_packed, 0)
    g_dist_ext = _lane(g_packed, 1)
    g_aux_ext = _lane(g_packed, 2)
    g_pen = _lane(g_packed, 9)
    g_tfeat = g_tfeat_ref[:].astype(jnp.float32)

    ddf_out, aux_out = m["ddf_out"], m["aux_out"]
    hj1, hj2 = m["hj1"], m["hj2"]
    dg, agg, norm = m["dg"], m["agg"], m["norm"]
    dgn, d_ddt, dinv = m["dgn"], m["d_ddt"], m["dinv"]
    aux, auxd, sig_a, spd = m["aux"], m["auxd"], m["sig_a"], m["spd"]
    inv_dgn_eps = m["inv_dgn_eps"]

    # ---- penalty p1 (sg: ag_scale entirely; sg(dinv) inside rest) ----
    diff = m["d2"] - m["rest"]
    g_diff = g_pen * w_ag * m["ag_scale"] * 2.0 * diff
    g_agg = tuple(g_diff * norm[a] for a in range(3))      # via d2
    g_norm_int = tuple(g_diff * agg[a] for a in range(3))  # via d2
    g_aux = -g_diff * 3.0 * dinv            # via rest; dinv is sg
    # ---- p2 ----
    g_dddt = g_pen * w_ddt * 2.0 * _relu(d_ddt - 1.0)
    # ---- p3 / p4 (direct on pre-activations) ----
    r3 = _relu(-4.6 - ddf_out) + _relu(ddf_out - drmax)
    g_ddf_out = g_pen * w_rd * 2.0 * r3 * (
        -(jnp.where(-4.6 - ddf_out > 0, 1.0, 0.0))
        + jnp.where(ddf_out - drmax > 0, 1.0, 0.0)
    )
    r4 = _relu(-4.6 - aux_out) + _relu(aux_out - 4.6)
    g_aux_out = g_pen * w_ra * 2.0 * r4 * (
        -(jnp.where(-4.6 - aux_out > 0, 1.0, 0.0))
        + jnp.where(aux_out - 4.6 > 0, 1.0, 0.0)
    )

    # ---- density = relu(dinv * (1 - d_ddt)) ----
    u = dinv * (1.0 - d_ddt)
    g_u = g_dens * jnp.where(u > 0, 1.0, 0.0)
    g_dinv = g_u * (1.0 - d_ddt)
    g_dddt = g_dddt - g_u * dinv

    # ---- aux_grad output ----
    g_aux = g_aux + g_aux_ext

    # ---- d_ddt = sqrt(grad_sq + aux^2) ----
    inv_dddt = 1.0 / jnp.maximum(d_ddt, 1e-12)
    g_grad_sq = g_dddt * 0.5 * inv_dddt
    g_aux = g_aux + g_dddt * aux * inv_dddt

    # ---- norm = dg / (dgn + eps), internal consumers only ----
    g_dg = [g_norm_int[a] * inv_dgn_eps for a in range(3)]
    g_dgn = -(
        g_norm_int[0] * dg[0] + g_norm_int[1] * dg[1]
        + g_norm_int[2] * dg[2]
    ) * inv_dgn_eps * inv_dgn_eps

    # ---- dgn = sqrt(grad_sq) ----
    g_grad_sq = g_grad_sq + g_dgn * 0.5 / jnp.maximum(dgn, 1e-12)

    # ---- grad_sq = sum dg^2 ----
    g_dg = [g_dg[a] + 2.0 * dg[a] * g_grad_sq for a in range(3)]

    # ---- dinv = 1 / distance ----
    g_dist = g_dist_ext - g_dinv * dinv * dinv

    # ---- agg[a] = auxd * hj2[a]; auxd = ags * sig_a (1 - sig_a) ----
    g_hj2 = tuple(g_agg[a] * auxd for a in range(3))
    g_auxd = (
        g_agg[0] * hj2[0] + g_agg[1] * hj2[1] + g_agg[2] * hj2[2]
    )
    # d auxd / d aux_out = ags * sig_a(1-sig_a)(1-2 sig_a)
    g_aux_out = g_aux_out + g_auxd * ags * sig_a * (1.0 - sig_a) * (
        1.0 - 2.0 * sig_a
    )
    # ---- aux = ags * sig_a ----
    g_aux_out = g_aux_out + g_aux * auxd

    # ---- dg[a] = spd * hj1[a]; spd = sigmoid(ddf_out) ----
    g_hj1 = tuple(g_dg[a] * spd for a in range(3))
    g_spd = g_dg[0] * hj1[0] + g_dg[1] * hj1[1] + g_dg[2] * hj1[2]
    g_ddf_out = g_ddf_out + g_spd * spd * (1.0 - spd)
    # ---- distance = softplus(ddf_out) + d_near ----
    g_ddf_out = g_ddf_out + g_dist * spd

    # ---- heads: h1 = stack@wd (+b on value rows); h2 = stack@wa ----
    g_h1 = jnp.concatenate([g_ddf_out, *g_hj1], axis=0)  # [4T, 1]
    g_h2 = jnp.concatenate([g_aux_out, *g_hj2], axis=0)  # [4T, 1]
    # stream cotangent as a broadcast outer product (VPU): [4T,1]x[1,C]
    d_stream = g_h1 * wdr_ref[:] + g_h2 * war_ref[:]  # [4T, C] f32
    dv_ref[:] = d_stream[:tile].astype(dv_ref.dtype)
    # t_feat = sum_a j[a] * sg(dg[a]) — j gets the broadcast back
    for a in range(3):
        dj_ref[a] = (
            d_stream[(1 + a) * tile:(2 + a) * tile] + g_tfeat * dg[a]
        ).astype(dj_ref.dtype)

    # weight grads as sublane reductions of stack * g_h — no [4T,C]
    # transpose, no N=1 matvec
    stack_f = stack.astype(jnp.float32)
    dwd = jnp.sum(stack_f * g_h1, axis=0, keepdims=True)  # [1, C]
    dwa = jnp.sum(stack_f * g_h2, axis=0, keepdims=True)
    db2 = jnp.concatenate(
        [jnp.sum(g_ddf_out, axis=0, keepdims=True),
         jnp.sum(g_aux_out, axis=0, keepdims=True)], axis=1,
    )  # [1, 2]

    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        dwd_ref[:] = dwd
        dwa_ref[:] = dwa
        db2_ref[:] = db2

    @pl.when(jnp.logical_not(is_first))
    def _():
        dwd_ref[:] = dwd_ref[:] + dwd
        dwa_ref[:] = dwa_ref[:] + dwa
        db2_ref[:] = db2_ref[:] + db2


def _run_fwd(v, j, wd, wa, b2, scal, out_dtype, interpret):
    m, c = v.shape
    if m % TILE:
        raise ValueError(f"rows {m} not a multiple of {TILE}")
    grid = (m // TILE,)
    vm = pltpu.VMEM
    sm = pltpu.SMEM
    in_specs = [
        pl.BlockSpec((TILE, c), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((3, TILE, c), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec(wd.shape, lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((2,), lambda i: (0,), memory_space=sm),
        pl.BlockSpec((8,), lambda i: (0,), memory_space=sm),
    ]
    out_specs = (
        pl.BlockSpec((TILE, PACK_W), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((TILE, c), lambda i: (i, 0), memory_space=vm),
    )
    odt = jnp.dtype(out_dtype)
    out_shape = (
        jax.ShapeDtypeStruct((m, PACK_W), jnp.float32),
        jax.ShapeDtypeStruct((m, c), odt),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, odt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(v, j, wd, wa, b2, scal)


def _run_bwd(v, j, wd, wa, b2, scal, g_packed, g_tfeat, interpret):
    m, c = v.shape
    grid = (m // TILE,)
    vm = pltpu.VMEM
    sm = pltpu.SMEM
    wdr = jnp.reshape(wd, (1, c)).astype(jnp.float32)
    war = jnp.reshape(wa, (1, c)).astype(jnp.float32)
    in_specs = [
        pl.BlockSpec((TILE, c), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((3, TILE, c), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec(wd.shape, lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((2,), lambda i: (0,), memory_space=sm),
        pl.BlockSpec((8,), lambda i: (0,), memory_space=sm),
        pl.BlockSpec((TILE, PACK_W), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((TILE, c), lambda i: (i, 0), memory_space=vm),
    ]
    out_specs = [
        pl.BlockSpec((TILE, c), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((3, TILE, c), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=vm),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, c), v.dtype),
        jax.ShapeDtypeStruct((3, m, c), j.dtype),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, 2), jnp.float32),
    ]
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(v, j, wd, wa, wdr, war, b2, scal, g_packed, g_tfeat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def neddf_epilogue(
    v: Array, j: Array, wd: Array, wa: Array, b2: Array, scal: Array,
    out_dtype: str = "float32", interpret: bool = False,
) -> Tuple[Array, ...]:
    """Fused heads + density + trunk penalties + color-tangent seed.

    Args:
        v: [M, C] trunk value stream (M multiple of TILE).
        j: [3, M, C] trunk Jacobian planes.
        wd: [C, 1] distance-head weight.
        wa: [C, 1] aux-head weight.
        b2: [2] f32 (distance bias, aux bias).
        scal: [8] f32 scalars (d_near, aux_grad_scale,
            distance_range_max, w_constraints_aux_grad,
            w_constraints_dDdt, w_range_distance, w_range_aux_grad, 0).
        out_dtype: dtype of t_feat (match the color kernel's input).
        interpret: Pallas interpreter (CPU tests).

    Returns:
        (packed [M, 16] f32, t_feat [M, C]). packed lanes: 0 density,
        1 distance, 2 aux_grad, 3:6 normalized grad D, 6:9 grad D,
        9 penalty sum, 10: zero. Lanes 3:9 have STOP-GRADIENT
        semantics: their cotangents are discarded, matching apply's
        sg() consumption of norm and the tangent direction.
    """
    return _run_fwd(v, j, wd, wa, b2, scal, out_dtype, interpret)


def _epi_fwd(v, j, wd, wa, b2, scal, out_dtype, interpret):
    outs = _run_fwd(v, j, wd, wa, b2, scal, out_dtype, interpret)
    return outs, (v, j, wd, wa, b2, scal)


def _epi_bwd(out_dtype, interpret, res, g):
    v, j, wd, wa, b2, scal = res
    g_packed, g_tfeat = g
    dv, dj, dwd, dwa, db2 = _run_bwd(
        v, j, wd, wa, b2, scal, g_packed, g_tfeat, interpret,
    )
    return (dv, dj,
            dwd.reshape(wd.shape).astype(wd.dtype),
            dwa.reshape(wa.shape).astype(wa.dtype),
            db2.reshape(2), jnp.zeros_like(scal))


neddf_epilogue.defvjp(_epi_fwd, _epi_bwd)
