"""Fused SDF-trunk-with-normals kernel vs the jnp oracle
(ops/sdf_grad.py): forward (h, gE) and the hand-written VJP (de, dW,
db — including the second-derivative couplings of the sweep adjoint)
must match jax.grad through the pure-jnp formulation. f32 exactness
mode, Pallas interpreter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.kernels.dual_mlp import matmul_dtype, pad_rows
from neddf_tpu.kernels.sdf_mlp import TILE_M, sdf_mlp
from neddf_tpu.ops.sdf_grad import sdf_trunk_with_grad

L, C, E = 4, 24, 30
LAYOUT = (False, False, True, False)
M = TILE_M  # one tile exactly; multi-tile covered below


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(61)
    e = jnp.asarray(rng.standard_normal((M, E)).astype(np.float32))
    ws, bs = [], []
    for li in range(L):
        fan_in = E if li == 0 else (C + E if LAYOUT[li] else C)
        ws.append(
            jnp.asarray(
                (rng.standard_normal((fan_in, C)) * 0.4).astype(np.float32)
            )
        )
        bs.append(
            jnp.asarray((rng.standard_normal((C,)) * 0.1).astype(np.float32))
        )
    return e, tuple(ws), tuple(bs)


def _kernel(e, ws, bs):
    return sdf_mlp(e, ws, bs, LAYOUT, "tanhExp", "float32", True)


def _oracle(e, ws, bs):
    return sdf_trunk_with_grad(e, ws, bs, LAYOUT, "tanhExp")


def test_forward_matches_oracle(setup):
    e, ws, bs = setup
    with matmul_dtype(jnp.float32):
        h1, g1 = _oracle(e, ws, bs)
        h2, g2 = _kernel(e, ws, bs)
    np.testing.assert_allclose(
        np.asarray(h1), np.asarray(h2), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6
    )


def test_vjp_matches_oracle(setup):
    """The hand-written backward (sweep adjoint with f'' couplings +
    combined trunk backward) against jax.grad of the jnp path."""
    e, ws, bs = setup

    def loss(fn):
        def g(e_, ws_, bs_):
            h, gE = fn(e_, ws_, bs_)
            return (
                jnp.sum(jnp.sin(h))
                + jnp.sum(jnp.square(gE))
                + jnp.sum(h[:, 0] * gE[:, 0])
            )

        return g

    with matmul_dtype(jnp.float32):
        g1 = jax.grad(loss(_oracle), argnums=(0, 1, 2))(e, ws, bs)
        g2 = jax.grad(loss(_kernel), argnums=(0, 1, 2))(e, ws, bs)
    names = ["de"] + [f"dw{i}" for i in range(L)] + [f"db{i}" for i in range(L)]
    flat1 = [g1[0]] + list(g1[1]) + list(g1[2])
    flat2 = [g2[0]] + list(g2[1]) + list(g2[2])
    for name, a, b in zip(names, flat1, flat2):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-5,
            atol=2e-5, err_msg=name,
        )


def test_multi_tile_and_padding(setup):
    """Grid accumulation of dW/db over multiple row tiles + pad_rows."""
    e, ws, bs = setup
    e3 = jnp.concatenate([e, e * 0.5, e + 0.1], axis=0)  # 3 tiles
    ep, m = pad_rows(e3, TILE_M)

    def loss(fn):
        def g(e_, ws_, bs_):
            h, gE = fn(e_, ws_, bs_)
            return jnp.sum(jnp.sin(h[:m])) + jnp.sum(jnp.square(gE[:m]))

        return g

    with matmul_dtype(jnp.float32):
        h1, g1 = _oracle(ep, ws, bs)
        h2, g2 = _kernel(ep, ws, bs)
        np.testing.assert_allclose(
            np.asarray(h1[:m]), np.asarray(h2[:m]), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g1[:m]), np.asarray(g2[:m]), rtol=1e-5, atol=1e-6
        )
        ga = jax.grad(loss(_oracle), argnums=(1, 2))(ep, ws, bs)
        gb = jax.grad(loss(_kernel), argnums=(1, 2))(ep, ws, bs)
    for a, b in zip(
        jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)
    ):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-5,
            atol=2e-5,
        )
