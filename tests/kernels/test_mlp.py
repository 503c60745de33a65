"""Fused plain-MLP kernel: forward + VJP vs a jnp twin (exact f32)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neddf_tpu.kernels.mlp as K
from neddf_tpu.kernels.dual_mlp import matmul_dtype
from neddf_tpu.ops.activations import relu

M = K.TILE_M * 2
WIDTHS = (24, 8)  # embed_pos, extra segment
CH = 32
LAYOUT = (False, False, True, False)  # skip after layer 1 (NeRF order)
ACT = "ReLU"


def ref_forward(vs, weights, biases):
    h = jnp.concatenate(vs, axis=-1)
    seg0 = vs[0]
    for li, split in enumerate(LAYOUT):
        w, b = weights[li], biases[li]
        x = jnp.concatenate([h, seg0], axis=-1) if (split and li > 0) else h
        if li == 0:
            x = jnp.concatenate(vs, axis=-1)
        h = relu(x @ w + b)
    return h


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    vs = tuple(jnp.asarray(rng.normal(size=(M, w)).astype(np.float32)) for w in WIDTHS)
    shapes = []
    cin = sum(WIDTHS)
    for li, split in enumerate(LAYOUT):
        if split and li > 0:
            cin += WIDTHS[0]
        shapes.append((cin, CH))
        cin = CH
    weights = tuple(
        jnp.asarray(rng.normal(size=s, scale=0.3).astype(np.float32)) for s in shapes
    )
    biases = tuple(
        jnp.asarray(rng.normal(size=(s[1],), scale=0.1).astype(np.float32))
        for s in shapes
    )
    return vs, weights, biases


def test_forward_exact_f32(setup):
    vs, weights, biases = setup
    with matmul_dtype(jnp.float32):
        out = K.mlp_seg(vs, weights, biases, LAYOUT, ACT, "float32", True)
    ref = ref_forward(vs, weights, biases)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_vjp_exact_f32(setup):
    vs, weights, biases = setup

    def loss_k(vs, weights, biases):
        return jnp.sum(
            jnp.sin(K.mlp_seg(vs, weights, biases, LAYOUT, ACT, "float32", True))
        )

    def loss_r(vs, weights, biases):
        return jnp.sum(jnp.sin(ref_forward(vs, weights, biases)))

    with matmul_dtype(jnp.float32):
        gk = jax.grad(loss_k, argnums=(0, 1, 2))(vs, weights, biases)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(vs, weights, biases)
    for tree_k, tree_r, name in zip(gk, gr, ("dv", "dW", "db")):
        for i, (a, b) in enumerate(zip(tree_k, tree_r)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                rtol=1e-4, atol=1e-4 * (float(jnp.abs(b).max()) + 1e-9),
                err_msg=f"{name}[{i}]",
            )


def test_bf16_out(setup):
    vs, weights, biases = setup
    out = K.mlp_seg(vs, weights, biases, LAYOUT, ACT, "bfloat16", True)
    assert out.dtype == jnp.bfloat16
    ref = ref_forward(vs, weights, biases)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert np.median(err) < 5e-2 * (np.abs(np.asarray(ref)).max() + 1e-6)


def test_stash_backward_matches_recompute(setup):
    """mlp_stash(True): the forward writes per-layer pre-activations and
    the backward consumes them instead of recomputing — grads must be
    EXACT vs the recompute variant in f32 (the stash rides the segment
    dtype, so f32 inputs stash f32)."""
    vs, weights, biases = setup

    def loss(vs, weights, biases):
        return jnp.sum(
            jnp.sin(K.mlp_seg(vs, weights, biases, LAYOUT, ACT, "float32", True))
        )

    with matmul_dtype(jnp.float32):
        g_rec = jax.grad(loss, argnums=(0, 1, 2))(vs, weights, biases)
        with K.mlp_stash(True):
            g_stash = jax.grad(loss, argnums=(0, 1, 2))(vs, weights, biases)
    for tree_a, tree_b, name in zip(g_rec, g_stash, ("dv", "dW", "db")):
        for i, (a, b) in enumerate(zip(tree_a, tree_b)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{name}[{i}]"
            )


def test_stash_forward_value_unchanged(setup):
    vs, weights, biases = setup
    with matmul_dtype(jnp.float32):
        base = K.mlp_seg(vs, weights, biases, LAYOUT, ACT, "float32", True)
        with K.mlp_stash(True):
            # primal value path AND the vjp-forward both stay exact
            out = K.mlp_seg(vs, weights, biases, LAYOUT, ACT, "float32", True)
            out2, _ = jax.vjp(
                lambda v: K.mlp_seg(v, weights, biases, LAYOUT, ACT,
                                    "float32", True), vs,
            )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(base))
