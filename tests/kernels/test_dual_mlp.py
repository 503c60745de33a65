"""Fused dual-MLP Pallas kernel: forward + hand-written VJP correctness.

Runs in Pallas interpreter mode on CPU. Logic checks force the kernel's
matmuls to f32 (``matmul_dtype``) and compare bit-tight against a plain
jnp twin; the production bf16 path gets a loose-tolerance sanity check
(two independently-ordered bf16 pipelines legitimately differ by
~2^-8 relative at rounding boundaries). The semantics under test are
the reference's dual-pair propagation (neddf/nn_module/with_grad/
linear.py, skip concat order neddf/network/neddf.py:214-219) including
the f'' second-order coupling in the backward
(e.g. with_grad/softplus.py:83-89).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neddf_tpu.kernels.dual_mlp as K
from neddf_tpu.kernels.dual_mlp import (
    TILE_M,
    dual_mlp,
    dual_pack_to_planes,
    matmul_dtype,
    pad_rows,
    planes_to_dual_pack,
)
from neddf_tpu.ops.activations import tanh_exp, tanh_exp_deriv
from neddf_tpu.ops.dual import mlp_dual

M = TILE_M * 2
C0 = 12
CH = 32
LAYOUT = (False, False, False, True, False)  # skip after layer 2
ACT = "tanhExp"


def ref_forward(v0, j0, weights, biases):
    """Plain f32 jnp twin of the kernel's math."""
    emb_v, emb_j = v0, j0
    v, j = v0, j0
    for li, split in enumerate(LAYOUT):
        w, b = weights[li], biases[li]
        if split:
            we, wh = w[:C0], w[C0:]
            pre = emb_v @ we + v @ wh + b
            jw = emb_j @ we + j @ wh
        else:
            pre = v @ w + b
            jw = j @ w
        v = tanh_exp(pre)
        j = tanh_exp_deriv(pre) * jw
    return v, j


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.normal(size=(M, C0)).astype(np.float32))
    j0 = jnp.asarray(rng.normal(size=(3, M, C0)).astype(np.float32))
    widths = []
    cin = C0
    for split in LAYOUT:
        if split:
            cin += C0
        widths.append((cin, CH))
        cin = CH
    weights = tuple(
        jnp.asarray(rng.normal(size=s, scale=0.3).astype(np.float32)) for s in widths
    )
    biases = tuple(
        jnp.asarray(rng.normal(size=(s[1],), scale=0.1).astype(np.float32))
        for s in widths
    )
    return v0, j0, weights, biases


def kernel_fn(v0, j0, weights, biases):
    return dual_mlp(v0, j0, weights, biases, LAYOUT, ACT, True)


def test_forward_exact_f32(setup):
    v0, j0, weights, biases = setup
    with matmul_dtype(jnp.float32):
        kv, kj = kernel_fn(v0, j0, weights, biases)
    rv, rj = ref_forward(v0, j0, weights, biases)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(rv), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kj), np.asarray(rj), rtol=1e-5, atol=1e-4)


def test_forward_matches_ops_dual_mlp(setup):
    """Anchor to the production jnp dual path (same semantics, f32)."""
    v0, j0, weights, biases = setup
    with matmul_dtype(jnp.float32):
        kv, kj = kernel_fn(v0, j0, weights, biases)
    d = planes_to_dual_pack(v0, j0)
    out = mlp_dual(
        d, weights, biases, tanh_exp, tanh_exp_deriv, skips=(2,), skip_input=d
    )
    rv, rj = dual_pack_to_planes(out)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(rv), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kj), np.asarray(rj), rtol=1e-5, atol=1e-4)


def test_forward_bf16_production_path(setup):
    """Production bf16 matmuls stay within bf16 noise of the f32 truth."""
    v0, j0, weights, biases = setup
    kv, kj = kernel_fn(v0, j0, weights, biases)  # default bf16
    rv, rj = ref_forward(v0, j0, weights, biases)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(rv), rtol=5e-2, atol=5e-2)
    err = np.abs(np.asarray(kj) - np.asarray(rj))
    scale = np.abs(np.asarray(rj)).max()
    assert np.median(err) < 5e-3 * scale
    assert err.max() < 0.1 * scale


def test_vjp_exact_f32(setup):
    """Hand-written backward == autodiff of the twin, in exact f32."""
    v0, j0, weights, biases = setup

    def loss_kernel(v0, j0, weights, biases):
        v, j = kernel_fn(v0, j0, weights, biases)
        return jnp.sum(jnp.sin(v)) + jnp.sum(j * j)

    def loss_ref(v0, j0, weights, biases):
        v, j = ref_forward(v0, j0, weights, biases)
        return jnp.sum(jnp.sin(v)) + jnp.sum(j * j)

    # the custom-vjp backward runs at grad evaluation time, so the f32
    # switch must wrap the whole grad call, not just the forward
    with matmul_dtype(jnp.float32):
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(v0, j0, weights, biases)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(v0, j0, weights, biases)
    for a, b, name in [(gk[0], gr[0], "dv0"), (gk[1], gr[1], "dj0")]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4,
            atol=1e-4 * float(jnp.abs(b).max()),
            err_msg=name,
        )
    for li, (dwk, dwr) in enumerate(zip(gk[2], gr[2])):
        np.testing.assert_allclose(
            np.asarray(dwk), np.asarray(dwr),
            rtol=1e-4, atol=1e-4 * float(jnp.abs(dwr).max()),
            err_msg=f"dW[{li}]",
        )
    for li, (dbk, dbr) in enumerate(zip(gk[3], gr[3])):
        np.testing.assert_allclose(
            np.asarray(dbk), np.asarray(dbr),
            rtol=1e-4, atol=1e-4 * float(jnp.abs(dbr).max()),
            err_msg=f"db[{li}]",
        )


def test_grad_through_jacobian_second_order(setup):
    """Reverse-over-forward: the loss depends on the TANGENT output, so
    the backward must include the f'' coupling. Finite-difference the
    twin loss and compare with the kernel gradient (both f32)."""
    v0, j0, weights, biases = setup

    def loss_kernel(v0):
        v, j = kernel_fn(v0, j0, weights, biases)
        return jnp.sum(j * j)

    def loss_ref(v0):
        v, j = ref_forward(v0, j0, weights, biases)
        return jnp.sum(j * j)

    with matmul_dtype(jnp.float32):
        g = jax.grad(loss_kernel)(v0)
    eps = 1e-3
    rng = np.random.default_rng(1)
    for _ in range(3):
        direction = jnp.asarray(rng.normal(size=v0.shape).astype(np.float32))
        fd = (loss_ref(v0 + eps * direction) - loss_ref(v0 - eps * direction)) / (
            2 * eps
        )
        analytic = jnp.sum(g * direction)
        np.testing.assert_allclose(float(analytic), float(fd), rtol=2e-2)


def test_pad_rows():
    x = jnp.ones((TILE_M + 7, 4))
    padded, m = pad_rows(x)
    assert padded.shape == (2 * TILE_M, 4)
    assert m == TILE_M + 7
    y = jnp.ones((TILE_M, 4))
    same, m2 = pad_rows(y)
    assert same is y and m2 == TILE_M


def test_rows_must_be_tile_multiple(setup):
    """Non-TILE_M-multiple rows would silently skip the tail of the
    grid; the kernel must reject them (callers use pad_rows)."""
    v0, j0, weights, biases = setup
    with pytest.raises(ValueError, match="multiple of TILE_M"):
        kernel_fn(v0[:768], j0[:, :768], weights, biases)


def test_stashed_backward_matches_recompute(setup):
    """The HBM-stash backward is the same arithmetic as the per-tile
    recompute backward (same pre values, same dtype chain); only
    backend-level matmul accumulation order differs between the two
    compiled programs, so compare to f32-roundoff tolerance in
    exactness mode and bf16 noise in production mode."""
    v0, j0, weights, biases = setup

    def loss(v0, j0, weights, biases):
        v, j = kernel_fn(v0, j0, weights, biases)
        return jnp.sum(jnp.sin(v)) + jnp.sum(j * j)

    for dt, rtol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        with matmul_dtype(dt):
            with K.bwd_stash(True):
                g_stash = jax.grad(loss, argnums=(0, 1, 2, 3))(
                    v0, j0, weights, biases
                )
            with K.bwd_stash(False):
                g_rec = jax.grad(loss, argnums=(0, 1, 2, 3))(
                    v0, j0, weights, biases
                )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_stash), jax.tree_util.tree_leaves(g_rec)
        ):
            b = np.asarray(b)
            np.testing.assert_allclose(
                np.asarray(a), b, rtol=rtol,
                atol=rtol * max(1e-6, float(np.abs(b).max())),
            )


def test_stash_stride_matches_full_stash(setup):
    """stash_stride(s) stashes every s-th layer's pre-activations and
    recomputes the rest in the backward. In f32 exactness mode the
    recomputed values replay the forward arithmetic exactly, but the
    compiled dot reductions block differently across program variants
    (same reason test_stashed_backward_matches_recompute is not
    bitwise), so compare at f32-roundoff tolerance — for every stride,
    incl. one larger than the layer count (= only layer 0 stashed)."""
    v0, j0, weights, biases = setup

    def loss(v0, j0, weights, biases):
        v, j = kernel_fn(v0, j0, weights, biases)
        return jnp.sum(jnp.sin(v)) + jnp.sum(j * j)

    with matmul_dtype(jnp.float32):
        with K.stash_stride(1):
            g_full = jax.grad(loss, argnums=(0, 1, 2, 3))(
                v0, j0, weights, biases
            )
        for stride in (2, 3, 99):
            with K.stash_stride(stride):
                g_s = jax.grad(loss, argnums=(0, 1, 2, 3))(
                    v0, j0, weights, biases
                )
            for a, b in zip(
                jax.tree_util.tree_leaves(g_full),
                jax.tree_util.tree_leaves(g_s),
            ):
                b = np.asarray(b)
                np.testing.assert_allclose(
                    np.asarray(a), b, rtol=2e-5,
                    atol=2e-5 * max(1e-6, float(np.abs(b).max())),
                )
