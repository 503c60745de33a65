"""In-kernel PE segments vs the XLA-side encoding path.

The dual-MLP kernel can expand positional encodings from RAW per-sample
geometry inside the kernel (kernels/dual_mlp.py "in-kernel PE"): the
"id" kind reproduces ops.dual.pe_dual_planes (identity-seeded Jacobian,
the DDF trunk input), "dir" reproduces pe_dual_directional (K=1 JVP
seed, the color branch), "plain" reproduces ops.pe.positional_encoding.
These tests pin the fused path against the expanded path in f32
exactness mode: forward values must match bitwise; gradients w.r.t. the
raw PE inputs (pos/var/crow/seed) agree to f32-rounding (the chain is
algebraically identical but associates differently), and every other
gradient (weights, non-PE segments) must match bitwise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.kernels.dual_mlp import dual_mlp_seg, matmul_dtype
from neddf_tpu.ops.dual import pe_dual_directional, pe_dual_planes
from neddf_tpu.ops.pe import (
    pe_grad_scale,
    pe_lowpass_scale,
    pe_weights,
    positional_encoding,
)

M, R, RD, C, L, D = 512, 5, 4, 32, 4, 3
LAYOUT = (False,) * L


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    return dict(
        pos=jnp.asarray(rng.normal(size=(M, D)).astype(np.float32)),
        dirs=jnp.asarray(rng.normal(size=(M, D)).astype(np.float32)),
        var=jnp.asarray(
            rng.uniform(0.001, 0.01, size=(M, D)).astype(np.float32)
        ),
        seed=jnp.asarray(rng.normal(size=(1, M, D)).astype(np.float32)),
        feat=jnp.asarray(rng.normal(size=(M, C)).astype(np.float32)),
        feat_t=jnp.asarray(rng.normal(size=(1, M, C)).astype(np.float32)),
        crow=(pe_grad_scale(R) * pe_lowpass_scale(R, 3.3)).astype(
            jnp.float32
        ),
        lp=pe_lowpass_scale(R, 3.3).astype(jnp.float32),
        ws_id=(
            jnp.asarray(rng.normal(size=(2 * D * R, C)).astype(np.float32))
            * 0.3,
        )
        + tuple(
            jnp.asarray(rng.normal(size=(C, C)).astype(np.float32)) * 0.3
            for _ in range(L - 1)
        ),
        ws_col=(
            jnp.asarray(
                rng.normal(size=(2 * D * R + 2 * D * RD + C, C)).astype(
                    np.float32
                )
            )
            * 0.3,
        )
        + tuple(
            jnp.asarray(rng.normal(size=(C, C)).astype(np.float32)) * 0.3
            for _ in range(L - 1)
        ),
        bs=tuple(
            jnp.asarray(rng.normal(size=(C,)).astype(np.float32)) * 0.1
            for _ in range(L)
        ),
    )


def _id_ref(d, pos, var, crow):
    emb_v, emb_j = pe_dual_planes(pos, R, crow * pe_weights(var, R))
    return dual_mlp_seg(
        (emb_v,), (emb_j,), d["ws_id"], d["bs"], LAYOUT, "tanhExp",
        (True,), "float32", True,
    )


def _id_fused(d, pos, var, crow):
    return dual_mlp_seg(
        (pos,), (), d["ws_id"], d["bs"], LAYOUT, "tanhExp", (True,),
        "float32", True, pe_aux=(crow, var),
        pe=(("id", R, True, True),), n_tan=3,
    )


def test_identity_pe_forward_bitwise(data):
    with matmul_dtype(jnp.float32):
        v1, j1 = _id_ref(data, data["pos"], data["var"], data["crow"])
        v2, j2 = _id_fused(data, data["pos"], data["var"], data["crow"])
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))


def test_identity_pe_input_grads(data):
    def loss(f):
        def g(pos, var, crow):
            v, j = f(data, pos, var, crow)
            return jnp.sum(jnp.sin(v)) + 0.01 * jnp.sum(j * j)

        return g

    with matmul_dtype(jnp.float32):
        g1 = jax.grad(loss(_id_ref), argnums=(0, 1, 2))(
            data["pos"], data["var"], data["crow"]
        )
        g2 = jax.grad(loss(_id_fused), argnums=(0, 1, 2))(
            data["pos"], data["var"], data["crow"]
        )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-5
        )


def test_identity_pe_weight_grads_bitwise(data):
    def loss(fused):
        def g(ws):
            if fused:
                v, j = dual_mlp_seg(
                    (data["pos"],), (), ws, data["bs"], LAYOUT, "tanhExp",
                    (True,), "float32", True,
                    pe_aux=(data["crow"], data["var"]),
                    pe=(("id", R, True, True),), n_tan=3,
                )
            else:
                emb_v, emb_j = pe_dual_planes(
                    data["pos"], R,
                    data["crow"] * pe_weights(data["var"], R),
                )
                v, j = dual_mlp_seg(
                    (emb_v,), (emb_j,), ws, data["bs"], LAYOUT, "tanhExp",
                    (True,), "float32", True,
                )
            return jnp.sum(jnp.sin(v)) + 0.01 * jnp.sum(j * j)

        return g

    with matmul_dtype(jnp.float32):
        g1 = jax.grad(loss(False))(data["ws_id"])
        g2 = jax.grad(loss(True))(data["ws_id"])
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _col_ref(d, pos, dirs, seed, feat, feat_t, var, lp):
    ep_v, ep_t = pe_dual_directional(pos, R, seed[0], lp * pe_weights(var, R))
    ed = positional_encoding(dirs, RD)
    return dual_mlp_seg(
        (ep_v, ed, feat), (ep_t[None], feat_t), d["ws_col"], d["bs"],
        LAYOUT, "tanhExp", (True, False, True), "float32", True,
    )


def _col_fused(d, pos, dirs, seed, feat, feat_t, var, lp):
    return dual_mlp_seg(
        (pos, dirs, feat), (seed, feat_t), d["ws_col"], d["bs"], LAYOUT,
        "tanhExp", (True, False, True), "float32", True,
        pe_aux=(lp, var),
        pe=(("dir", R, True, True), ("plain", RD, False, False), None),
        n_tan=1,
    )


def test_dir_plain_pe_forward_bitwise(data):
    args = (
        data["pos"], data["dirs"], data["seed"], data["feat"],
        data["feat_t"], data["var"], data["lp"],
    )
    with matmul_dtype(jnp.float32):
        v1, t1 = _col_ref(data, *args)
        v2, t2 = _col_fused(data, *args)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_dir_plain_pe_grads(data):
    args = (
        data["pos"], data["dirs"], data["seed"], data["feat"],
        data["feat_t"], data["var"], data["lp"],
    )

    def loss(f):
        def g(*a):
            v, t = f(data, *a)
            return jnp.sum(jnp.cos(v)) + 0.01 * jnp.sum(t * t)

        return g

    with matmul_dtype(jnp.float32):
        g1 = jax.grad(loss(_col_ref), argnums=tuple(range(7)))(*args)
        g2 = jax.grad(loss(_col_fused), argnums=tuple(range(7)))(*args)
    names = ("pos", "dirs", "seed", "feat", "feat_t", "var", "lp")
    for name, a, b in zip(names, g1, g2):
        if name in ("feat", "feat_t"):
            # non-PE segments take the identical kernel path -> bitwise
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-5,
                err_msg=name,
            )
