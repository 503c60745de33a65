"""Dual-tensor algebra vs. finite differences and jacfwd.

Mirrors the reference's most important test pattern
(tests/nn_module/with_grad/*): the forward-propagated Jacobian must match
numerical differentiation, and reverse-mode gradients THROUGH the
Jacobian (second derivatives) must match autodiff of the explicit
jacobian program.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.ops import ACTIVATIONS
from neddf_tpu.ops.dual import (
    act_dual,
    dual_jacobian,
    dual_value,
    linear_dual,
    pack_dual,
    pe_dual,
)


def numerical_jacobian(f, x, eps=1e-4):
    """[M, C_out, 3] finite-difference Jacobian of f: [M,3]->[M,C]."""
    cols = []
    for a in range(x.shape[1]):
        dx = np.zeros_like(x)
        dx[:, a] = eps
        cols.append((f(x + dx) - f(x - dx)) / (2 * eps))
    return np.stack(cols, axis=1)  # [M, 3, C]


@pytest.mark.parametrize("rank", [4, 10])
def test_pe_dual_matches_finite_difference(rank, rng):
    x = rng.standard_normal((8, 3)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, size=(1, rank * 3)).astype(np.float32)

    d = pe_dual(jnp.asarray(x), rank, jnp.asarray(scale))
    f = lambda z: np.asarray(pe_dual(jnp.asarray(z), rank, jnp.asarray(scale)))[:, 0]
    num_j = numerical_jacobian(f, x)
    np.testing.assert_allclose(dual_jacobian(d), num_j, rtol=1e-2, atol=2e-2)


@pytest.mark.parametrize("rank", [4, 10])
def test_pe_dual_planes_matches_pack(rank, rng):
    """Plane-layout PE dual == the packed pe_dual, bit for bit."""
    from neddf_tpu.ops.dual import pe_dual_planes

    x = rng.standard_normal((8, 3)).astype(np.float32)
    # per-sample scale, like lowpass * mip weights in NeDDF
    scale = rng.uniform(0.5, 1.5, size=(8, rank * 3)).astype(np.float32)

    d = pe_dual(jnp.asarray(x), rank, jnp.asarray(scale))
    v, j = pe_dual_planes(jnp.asarray(x), rank, jnp.asarray(scale))
    np.testing.assert_array_equal(np.asarray(dual_value(d)), np.asarray(v))
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(dual_jacobian(d)), 1, 0), np.asarray(j)
    )


def test_linear_dual_propagates_jacobian(rng):
    x = rng.standard_normal((6, 5)).astype(np.float32)
    j = rng.standard_normal((6, 3, 5)).astype(np.float32)
    w = rng.standard_normal((5, 7)).astype(np.float32)
    b = rng.standard_normal(7).astype(np.float32)

    d = linear_dual(pack_dual(jnp.asarray(x), jnp.asarray(j)),
                    jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(dual_value(d), x @ w + b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dual_jacobian(d), j @ w, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "name", ["ReLU", "LeakyReLU", "tanhExp", "Softplus", "Sigmoid"]
)
def test_act_dual_chain_rule(name, rng):
    f, df = ACTIVATIONS[name]
    x = rng.standard_normal((16, 4)).astype(np.float32) * 2
    j = rng.standard_normal((16, 3, 4)).astype(np.float32)

    d = act_dual(pack_dual(jnp.asarray(x), jnp.asarray(j)), f, df)
    np.testing.assert_allclose(dual_value(d), f(jnp.asarray(x)), rtol=1e-5, atol=1e-6)

    # df against jax.grad of f
    g_auto = jax.vmap(jax.vmap(jax.grad(lambda v: f(v))))(jnp.asarray(x))
    np.testing.assert_allclose(df(jnp.asarray(x)), g_auto, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        dual_jacobian(d), np.asarray(df(jnp.asarray(x)))[:, None, :] * j,
        rtol=1e-5, atol=1e-6
    )


def test_dual_mlp_matches_jacfwd(rng):
    """Full 2-layer dual MLP Jacobian == jax.jacfwd of the plain MLP."""
    from neddf_tpu.ops.dual import mlp_dual

    f, df = ACTIVATIONS["tanhExp"]
    rank = 4
    w1 = rng.standard_normal((rank * 6, 16)).astype(np.float32) * 0.3
    b1 = rng.standard_normal(16).astype(np.float32) * 0.1
    w2 = rng.standard_normal((16, 8)).astype(np.float32) * 0.3
    b2 = rng.standard_normal(8).astype(np.float32) * 0.1
    x = rng.standard_normal((5, 3)).astype(np.float32)

    def plain(pos):
        from neddf_tpu.ops.pe import positional_encoding

        h = positional_encoding(pos[None, :], rank)[0]
        h = f(h @ w1 + b1)
        h = f(h @ w2 + b2)
        return h

    d = mlp_dual(
        pe_dual(jnp.asarray(x), rank),
        (jnp.asarray(w1), jnp.asarray(w2)),
        (jnp.asarray(b1), jnp.asarray(b2)),
        f,
        df,
    )
    jac_ref = jax.vmap(jax.jacfwd(plain))(jnp.asarray(x))  # [M, 8, 3]
    np.testing.assert_allclose(
        dual_jacobian(d), jnp.swapaxes(jac_ref, 1, 2), rtol=1e-4, atol=1e-4
    )


def test_reverse_over_forward(rng):
    """Gradients THROUGH the dual Jacobian (2nd derivatives) match autodiff
    of an explicit jacfwd program — the property the reference verifies in
    tests/nn_module/with_grad/test_activations.py."""
    f, df = ACTIVATIONS["Softplus"]
    w = rng.standard_normal((6, 4)).astype(np.float32) * 0.5
    x = rng.standard_normal((3, 3)).astype(np.float32)
    rank = 1

    def loss_dual(pos):
        d = act_dual(linear_dual(pe_dual(pos, rank), jnp.asarray(w)), f, df)
        return jnp.sum(jnp.square(dual_jacobian(d)))

    def loss_jacfwd(pos):
        def plain(p):
            from neddf_tpu.ops.pe import positional_encoding

            return f(positional_encoding(p[None, :], rank)[0] @ jnp.asarray(w))

        jac = jax.vmap(jax.jacfwd(plain))(pos)
        return jnp.sum(jnp.square(jac))

    g1 = jax.grad(loss_dual)(jnp.asarray(x))
    g2 = jax.grad(loss_jacfwd)(jnp.asarray(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", [512, 101, 3])
def test_pe_dual_planes_mip_bitwise(rng, n):
    """Lane-packed dual-plane PE == unpacked chain bitwise (ops/pe.py
    packed section; same products / sin calls / multiply order)."""
    from neddf_tpu.ops.dual import pe_dual_planes, pe_dual_planes_mip
    from neddf_tpu.ops.pe import pe_lowpass_scale, pe_packed, pe_weights

    rank = 10
    x = rng.standard_normal((n, 3)).astype(np.float32)
    var = np.abs(rng.standard_normal((n, 3))).astype(np.float32) * 0.01
    crow = np.asarray(pe_lowpass_scale(rank, 6.4)) * 0.7
    with pe_packed(False):
        v_ref, j_ref = pe_dual_planes(
            jnp.asarray(x), rank,
            jnp.asarray(crow) * pe_weights(jnp.asarray(var), rank),
        )
    with pe_packed(True):
        v, j = pe_dual_planes_mip(
            jnp.asarray(x), rank, var=jnp.asarray(var),
            chan_scale=jnp.asarray(crow),
        )
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(j), np.asarray(j_ref))


@pytest.mark.parametrize("n", [512, 37])
def test_pe_dual_directional_mip_bitwise(rng, n):
    from neddf_tpu.ops.dual import (
        pe_dual_directional,
        pe_dual_directional_mip,
    )
    from neddf_tpu.ops.pe import pe_lowpass_scale, pe_packed, pe_weights

    rank = 10
    x = rng.standard_normal((n, 3)).astype(np.float32)
    v_dir = rng.standard_normal((n, 3)).astype(np.float32)
    var = np.abs(rng.standard_normal((n, 3))).astype(np.float32) * 0.01
    lowpass = np.asarray(pe_lowpass_scale(rank, 7.1))
    with pe_packed(False):
        val_ref, tan_ref = pe_dual_directional(
            jnp.asarray(x), rank, jnp.asarray(v_dir),
            jnp.asarray(lowpass) * pe_weights(jnp.asarray(var), rank),
        )
    with pe_packed(True):
        val, tan = pe_dual_directional_mip(
            jnp.asarray(x), rank, jnp.asarray(v_dir),
            var=jnp.asarray(var), chan_scale=jnp.asarray(lowpass),
        )
    np.testing.assert_array_equal(np.asarray(val), np.asarray(val_ref))
    np.testing.assert_array_equal(np.asarray(tan), np.asarray(tan_ref))
