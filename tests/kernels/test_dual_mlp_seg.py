"""Multi-segment fused dual-MLP: concat-free first layer correctness.

Mirrors the NeDDF color branch shape (neddf/network/neddf.py:243-257):
segments [PE(pos) w/J, PE(dir) no-J, normal no-J, features w/J] whose
concat feeds the first dense layer. The kernel computes the same math
as concat + mlp_dual without materialising the concat; verified in
exact-f32 mode for values and gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.kernels.dual_mlp import TILE_M, dual_mlp_seg, matmul_dtype
from neddf_tpu.ops.activations import tanh_exp, tanh_exp_deriv

M = TILE_M
WIDTHS = (24, 8, 4, 32)  # PE(pos), PE(dir), normal, features
HAS_J = (True, False, False, True)
CH = 32
LAYOUT = (False, False, False)
ACT = "tanhExp"


def ref_forward(vs, js, weights, biases):
    """concat + plain dual MLP twin (f32)."""
    v = jnp.concatenate(vs, axis=-1)
    j_parts, ji = [], 0
    for w, hj in zip(WIDTHS, HAS_J):
        if hj:
            j_parts.append(js[ji])
            ji += 1
        else:
            j_parts.append(jnp.zeros((3, M, w), jnp.float32))
    j = jnp.concatenate(j_parts, axis=-1)
    for w, b in zip(weights, biases):
        pre = v @ w + b
        jw = j @ w
        v = tanh_exp(pre)
        j = tanh_exp_deriv(pre) * jw
    return v, j


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    vs = tuple(
        jnp.asarray(rng.normal(size=(M, w)).astype(np.float32)) for w in WIDTHS
    )
    js = tuple(
        jnp.asarray(rng.normal(size=(3, M, w)).astype(np.float32))
        for w, hj in zip(WIDTHS, HAS_J)
        if hj
    )
    cin = sum(WIDTHS)
    shapes = [(cin, CH), (CH, CH), (CH, CH)]
    weights = tuple(
        jnp.asarray(rng.normal(size=s, scale=0.3).astype(np.float32)) for s in shapes
    )
    biases = tuple(jnp.zeros((s[1],), jnp.float32) for s in shapes)
    return vs, js, weights, biases


def kernel_fn(vs, js, weights, biases):
    return dual_mlp_seg(vs, js, weights, biases, LAYOUT, ACT, HAS_J, "float32", True)


def test_forward_exact(setup):
    vs, js, weights, biases = setup
    with matmul_dtype(jnp.float32):
        kv, kj = kernel_fn(vs, js, weights, biases)
    rv, rj = ref_forward(vs, js, weights, biases)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(rv), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kj), np.asarray(rj), rtol=1e-5, atol=1e-4)


def test_vjp_exact(setup):
    vs, js, weights, biases = setup

    def loss_k(vs, js, weights, biases):
        v, j = kernel_fn(vs, js, weights, biases)
        return jnp.sum(jnp.sin(v)) + jnp.sum(j * j)

    def loss_r(vs, js, weights, biases):
        v, j = ref_forward(vs, js, weights, biases)
        return jnp.sum(jnp.sin(v)) + jnp.sum(j * j)

    with matmul_dtype(jnp.float32):
        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(vs, js, weights, biases)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(vs, js, weights, biases)

    for i in range(len(WIDTHS)):
        np.testing.assert_allclose(
            np.asarray(gk[0][i]), np.asarray(gr[0][i]),
            rtol=1e-4, atol=1e-4 * float(jnp.abs(gr[0][i]).max() + 1e-9),
            err_msg=f"dv[{i}]",
        )
    for i in range(len(js)):
        np.testing.assert_allclose(
            np.asarray(gk[1][i]), np.asarray(gr[1][i]),
            rtol=1e-4, atol=1e-4 * float(jnp.abs(gr[1][i]).max() + 1e-9),
            err_msg=f"dj[{i}]",
        )
    for li in range(len(weights)):
        np.testing.assert_allclose(
            np.asarray(gk[2][li]), np.asarray(gr[2][li]),
            rtol=1e-4, atol=1e-4 * float(jnp.abs(gr[2][li]).max()),
            err_msg=f"dW[{li}]",
        )
        np.testing.assert_allclose(
            np.asarray(gk[3][li]), np.asarray(gr[3][li]),
            rtol=1e-4, atol=1e-4 * float(jnp.abs(gr[3][li]).max()),
            err_msg=f"db[{li}]",
        )


def test_bf16_out_dtype(setup):
    vs, js, weights, biases = setup
    kv, kj = dual_mlp_seg(vs, js, weights, biases, LAYOUT, ACT, HAS_J,
                          "bfloat16", True)
    assert kv.dtype == jnp.bfloat16 and kj.dtype == jnp.bfloat16
    rv, rj = ref_forward(vs, js, weights, biases)
    np.testing.assert_allclose(
        np.asarray(kv, dtype=np.float32), np.asarray(rv), rtol=5e-2, atol=5e-2
    )
