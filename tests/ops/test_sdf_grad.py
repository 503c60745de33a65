"""Explicit reverse sweep (ops/sdf_grad.py) vs jax.grad: the oracle
chain for the fused NeuS normals kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.ops.pe import positional_encoding
from neddf_tpu.ops.sdf_grad import pe_chain_to_pos, sdf_trunk_with_grad

L, C, E = 4, 24, 30
LAYOUT = (False, False, True, False)  # skip after layer 1


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(51)
    e = jnp.asarray(rng.standard_normal((32, E)).astype(np.float32))
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


def _jax_grad_ref(e, ws, bs):
    """The existing formulation: jax.grad through the plain trunk."""
    from neddf_tpu.kernels.dual_mlp import _act_fns

    f, _, _ = _act_fns("tanhExp")

    def trunk(e_):
        h = None
        for li in range(L):
            if li == 0:
                z = e_ @ ws[li] + bs[li]
            elif LAYOUT[li]:
                z = h @ ws[li][:C] + e_ @ ws[li][C:] + bs[li]
            else:
                z = h @ ws[li] + bs[li]
            h = f(z)
        return h

    def sdf_sum(e_):
        h = trunk(e_)
        return jnp.sum(h[:, 0]), h

    (_, h), gE = jax.value_and_grad(sdf_sum, has_aux=True)(e)
    return h, gE


def test_sweep_matches_jax_grad(setup):
    e, ws, bs = setup
    h1, g1 = _jax_grad_ref(e, ws, bs)
    h2, g2 = sdf_trunk_with_grad(e, ws, bs, LAYOUT, "tanhExp")
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6
    )


def test_sweep_second_order_matches_jax_grad(setup):
    """Loss gradients THROUGH the gradient (what NeuS training needs:
    create_graph semantics) must match between the two formulations for
    every input, including weights."""
    e, ws, bs = setup

    def loss_via(fn):
        def g(e_, ws_, bs_):
            h, gE = fn(e_, ws_, bs_)
            return (
                jnp.sum(jnp.sin(h))
                + jnp.sum(jnp.square(gE))
                + jnp.sum(h[:, 0] * gE[:, 0])
            )

        return g

    f1 = loss_via(lambda e_, w_, b_: _jax_grad_ref(e_, w_, b_))
    f2 = loss_via(
        lambda e_, w_, b_: sdf_trunk_with_grad(e_, w_, b_, LAYOUT, "tanhExp")
    )
    g1 = jax.grad(f1, argnums=(0, 1, 2))(e, ws, bs)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(e, ws, bs)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-5,
            atol=2e-5,
        )


def test_pe_chain_matches_autodiff():
    """gE -> d/dpos chaining equals jax.grad through PE + trunk."""
    rng = np.random.default_rng(53)
    rank = 5
    pos = jnp.asarray((rng.standard_normal((16, 3)) * 0.7).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((6 * rank, 8)) * 0.3).astype(np.float32)
    )

    def sdf_sum(p):
        h = jnp.tanh(positional_encoding(p, rank) @ w)
        return jnp.sum(h[:, 0])

    g_ref = jax.grad(sdf_sum)(pos)

    # same thing via the explicit channel-sparse chain
    e = positional_encoding(pos, rank)

    def wrt_e(e_):
        return jnp.sum(jnp.tanh(e_ @ w)[:, 0])

    gE = jax.grad(wrt_e)(e)
    g = pe_chain_to_pos(gE, pos, rank)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-6
    )
