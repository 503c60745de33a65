"""Directional color JVP == the reference's full-Jacobian penalty.

NeDDF.apply now propagates ONE tangent (along sg(grad D)) through the
color branch instead of the full 3-plane Jacobian
(fields/neddf.py; reference materialises colorJ at neddf.py:243-257 and
contracts in the penalty at :263-265). The tangent path is linear, so
contract-at-seed == contract-at-output exactly (up to f32 summation
order). This pins the equivalence for VALUES and REVERSE-MODE GRADS
against an explicit 3-plane reconstruction, in f32, on both the jnp and
interpreter-kernel paths."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.fields import NeDDF
from neddf_tpu.geometry.rays import Sampling
from neddf_tpu.kernels.dual_mlp import matmul_dtype
from neddf_tpu.ops.activations import ACTIVATIONS
from neddf_tpu.ops.dual import (
    act_dual,
    dual_jacobian,
    dual_value,
    linear_dual,
    pe_dual,
)
from neddf_tpu.ops.pe import (
    pe_grad_scale,
    pe_lowpass_scale,
    pe_weights,
    positional_encoding,
)

KW = dict(
    embed_pos_rank=4, embed_dir_rank=2, ddf_layer_count=4,
    ddf_layer_width=32, col_layer_count=3, col_layer_width=32, skips=(1,),
)


@pytest.fixture(scope="module")
def setup():
    field = NeDDF(fused="off", **KW)
    key = jax.random.PRNGKey(11)
    params = field.init(key)
    rng = np.random.default_rng(5)
    s = Sampling(
        sample_pos=jnp.asarray(
            rng.uniform(-1.2, 1.2, (4, 16, 3)).astype(np.float32)
        ),
        sample_dir=jnp.asarray(rng.normal(size=(4, 16, 3)).astype(np.float32)),
        diag_variance=jnp.abs(
            jnp.asarray(rng.normal(size=(4, 16, 3)).astype(np.float32))
        ) * 1e-4,
    )
    return field, params, s


def _full_jacobian_constraints_color(field, params, sampling, sched):
    """The ORIGINAL formulation: full 3-plane color Jacobian, contracted
    with sg(distance_grad) at the end (reference neddf.py:243-265)."""
    act, dact = ACTIVATIONS[field.activation_type]
    sg = jax.lax.stop_gradient
    pos = sampling.sample_pos.reshape(-1, 3)
    direction = sampling.sample_dir.reshape(-1, 3)
    var = sampling.diag_variance.reshape(-1, 3)
    m = pos.shape[0]

    grad_scale = pe_grad_scale(field.embed_pos_rank)
    lowpass = pe_lowpass_scale(field.embed_pos_rank, sched.lowpass_alpha)
    weights = pe_weights(var, field.embed_pos_rank)
    embed_dir = positional_encoding(direction, field.embed_dir_rank)

    from neddf_tpu.ops.activations import softplus, softplus_deriv

    embed_scaled = pe_dual(
        pos, field.embed_pos_rank, grad_scale * lowpass * weights
    )
    h = embed_scaled
    for layer_id, layer in enumerate(params["layers_ddf"]):
        h = act_dual(linear_dual(h, layer["w"], layer["b"]), act, dact)
        if layer_id in field.skips:
            h = jnp.concatenate([embed_scaled, h], axis=-1)
    features = h
    ddf = linear_dual(
        features, params["layer_ddf_out"]["w"], params["layer_ddf_out"]["b"]
    )
    ddf_out = dual_value(ddf)
    ddf_jac = dual_jacobian(ddf)[:, :, 0]  # [M, 3]
    distance_grad = softplus_deriv(ddf_out) * ddf_jac
    dgn = jnp.linalg.norm(distance_grad, axis=1, keepdims=True)
    norm_dir = distance_grad / (dgn + 1e-7)
    del softplus

    embed_plain = pe_dual(pos, field.embed_pos_rank, lowpass * weights)
    col_y = jnp.concatenate(
        [dual_value(embed_plain), embed_dir, sg(norm_dir),
         dual_value(features)], axis=1,
    )
    col_j = jnp.concatenate(
        [dual_jacobian(embed_plain),
         jnp.zeros((m, 3, embed_dir.shape[1] + 3), col_y.dtype),
         dual_jacobian(features)], axis=2,
    )
    hc = jnp.concatenate([col_y[:, None, :], col_j], axis=1)
    for layer in params["layers_col"]:
        hc = act_dual(linear_dual(hc, layer["w"], layer["b"]), act, dact)
    col = linear_dual(
        hc, params["layer_col_out"]["w"], params["layer_col_out"]["b"]
    )
    color_j = dual_jacobian(col)  # [M, 3, 3]
    return jnp.sum(
        jnp.square(jnp.sum(color_j * sg(distance_grad)[:, :, None], axis=1)),
        axis=1,
    )


def _penalty_from_apply(field, params, sampling, sched):
    """Isolate constraints_color from apply's fields_penalty by zeroing
    every other weight."""
    pw = {k: 0.0 for k, _ in field.penalty_weight}
    # a key MISSING from the map enters unweighted (reference quirk,
    # neddf.py:296-300) — range_color is absent from the defaults, so it
    # must be zeroed explicitly for clean isolation
    pw["range_color"] = 0.0
    pw["constraints_color"] = 1.0
    f2 = dataclasses.replace(field, penalty_weight=tuple(sorted(pw.items())))
    out = f2.apply(params, sampling, sched)
    return out["fields_penalty"].reshape(-1)


@pytest.mark.parametrize("fused", ["off", "on"])
def test_directional_equals_full_jacobian(setup, fused):
    field, params, s = setup
    field = dataclasses.replace(field, fused=fused)
    sched = field.schedule(jnp.int32(500))
    with matmul_dtype(jnp.float32):
        got = _penalty_from_apply(field, params, s, sched)
    want = _full_jacobian_constraints_color(field, params, s, sched)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4,
        atol=1e-6 * max(1.0, float(jnp.abs(want).max())),
    )


@pytest.mark.parametrize("fused", ["off", "on"])
def test_directional_grads_equal_full_jacobian(setup, fused):
    field, params, s = setup
    field = dataclasses.replace(field, fused=fused)
    sched = field.schedule(jnp.int32(500))

    def loss_new(p):
        return jnp.sum(_penalty_from_apply(field, p, s, sched))

    def loss_old(p):
        return jnp.sum(_full_jacobian_constraints_color(field, p, s, sched))

    # context wraps the grad CALL (custom_vjp backwards trace there)
    with matmul_dtype(jnp.float32):
        g_new = jax.grad(loss_new)(params)
    g_old = jax.grad(loss_old)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_new), jax.tree_util.tree_leaves(g_old)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4,
            atol=1e-5 * max(1.0, float(jnp.abs(b).max())),
        )


def test_full_apply_outputs_unchanged(setup):
    """All OTHER outputs (density/distance/color/aux) must be bitwise
    unaffected by the color-branch rewrite (they never touched it)."""
    field, params, s = setup
    sched = field.schedule(jnp.int32(500))
    out = field.apply(params, s, sched)
    for k in ("distance", "density", "color", "aux_grad", "fields_penalty"):
        assert np.isfinite(np.asarray(out[k])).all(), k
