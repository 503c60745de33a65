"""row_sparse_adam semantics (training/optim.py).

Three properties that distinguish it from plain Adam and that the
camera-refinement divergence diagnosis rests on:

* a row whose gradient is zero receives EXACTLY no update and keeps
  its moments (plain Adam keeps pushing it with stale momentum);
* a row visited every step matches optax.adam bitwise-close (same
  m/v recursion, same bias correction indexed by its visit count);
* interleaved visits (round-robin cameras) behave like each row
  running its own dense Adam on its own subsequence of gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from neddf_tpu.training.optim import row_sparse_adam


def test_zero_grad_rows_untouched():
    tx = row_sparse_adam(0.01)
    params = jnp.zeros((3, 6))
    state = tx.init(params)
    g = jnp.zeros((3, 6)).at[1].set(1.0)
    for _ in range(5):
        updates, state = tx.update(g, state)
        assert float(jnp.abs(updates[0]).max()) == 0.0
        assert float(jnp.abs(updates[2]).max()) == 0.0
        assert float(jnp.abs(updates[1]).max()) > 0.0
    np.testing.assert_array_equal(np.asarray(state.m[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(state.v[2]), 0.0)
    assert int(state.t[0]) == 0 and int(state.t[1]) == 5


def test_dense_row_matches_optax_adam():
    key = jax.random.PRNGKey(0)
    grads = jax.random.normal(key, (7, 1, 4))
    tx = row_sparse_adam(0.003)
    ref = optax.adam(0.003)
    p = jnp.zeros((1, 4))
    s, s_ref = tx.init(p), ref.init(p)
    for i in range(7):
        u, s = tx.update(grads[i], s)
        u_ref, s_ref = ref.update(grads[i], s_ref, p)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   rtol=1e-5, atol=1e-7)


def test_round_robin_equals_per_row_dense():
    """Rows visited alternately must update exactly as if each row ran
    its own dense Adam over its own gradient subsequence."""
    key = jax.random.PRNGKey(1)
    seq = jax.random.normal(key, (6, 6))  # 3 visits for each of 2 rows
    tx = row_sparse_adam(0.01)
    params = jnp.zeros((2, 6))
    state = tx.init(params)
    p = params
    for i in range(6):
        g = jnp.zeros((2, 6)).at[i % 2].set(seq[i])
        u, state = tx.update(g, state)
        p = optax.apply_updates(p, u)

    ref = optax.adam(0.01)
    expected = []
    for row in range(2):
        pr = jnp.zeros((1, 6))
        sr = ref.init(pr)
        for i in range(row, 6, 2):
            ur, sr = ref.update(seq[i][None], sr, pr)
            pr = optax.apply_updates(pr, ur)
        expected.append(np.asarray(pr[0]))
    np.testing.assert_allclose(np.asarray(p), np.stack(expected),
                               rtol=1e-5, atol=1e-7)
