"""K=1 (directional JVP) mode of the generalized dual-MLP kernel.

The kernel stacks value + K tangent planes; K=3 serves the NeDDF trunk
and K=1 the directional color branch. This pins K=1 against the jnp
dual path (values, tangents, and reverse-mode grads including the f''
coupling) in f32 exactness mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.kernels.dual_mlp import dual_mlp_seg, matmul_dtype, pad_rows
from neddf_tpu.ops.activations import ACTIVATIONS
from neddf_tpu.ops.dual import act_dual, linear_dual

M, C_IN, C_HID = 512, 24, 32


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    v = rng.normal(size=(M, C_IN)).astype(np.float32)
    t = rng.normal(size=(1, M, C_IN)).astype(np.float32)
    dirs = rng.normal(size=(M, 8)).astype(np.float32)  # value-only segment
    weights = [
        rng.normal(size=(C_IN + 8, C_HID)).astype(np.float32) * 0.3,
        rng.normal(size=(C_HID, C_HID)).astype(np.float32) * 0.3,
        rng.normal(size=(C_HID, C_HID)).astype(np.float32) * 0.3,
    ]
    biases = [rng.normal(size=(C_HID,)).astype(np.float32) * 0.1
              for _ in weights]
    return v, t, dirs, weights, biases


def _jnp_ref(v, t, dirs, weights, biases, act_name):
    """[M, 2, C] dual through the same layer stack (generic dual ops)."""
    act, dact = ACTIVATIONS[act_name]
    zeros_t = jnp.zeros_like(dirs)
    h = jnp.stack(
        [jnp.concatenate([v, dirs], 1), jnp.concatenate([t[0], zeros_t], 1)],
        axis=1,
    )  # [M, 2, C_IN+8]
    for w, b in zip(weights, biases):
        h = act_dual(linear_dual(h, jnp.asarray(w), jnp.asarray(b)), act, dact)
    return h[:, 0, :], h[:, 1, :]


@pytest.mark.parametrize("act_name", ["tanhExp", "ReLU"])
def test_k1_forward_matches_jnp(setup, act_name):
    v, t, dirs, weights, biases = setup
    with matmul_dtype(jnp.float32):
        kv, kt = dual_mlp_seg(
            (jnp.asarray(v), jnp.asarray(dirs)),
            (jnp.asarray(t),),
            tuple(map(jnp.asarray, weights)),
            tuple(map(jnp.asarray, biases)),
            (False, False, False),
            act_name,
            (True, False),
            "float32",
            True,  # interpreter (CPU)
        )
    rv, rt = _jnp_ref(v, t, dirs, weights, biases, act_name)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(rv), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(kt[0]), np.asarray(rt), rtol=2e-5,
                               atol=2e-5)


def test_k1_grads_match_jnp(setup):
    """Reverse-mode through value AND tangent outputs (exercises the f''
    coupling with a single tangent plane)."""
    v, t, dirs, weights, biases = setup

    def loss_kernel(v_, t_, ws, bs):
        kv, kt = dual_mlp_seg(
            (v_, jnp.asarray(dirs)), (t_,),
            tuple(ws), tuple(bs), (False, False, False),
            "tanhExp", (True, False), "float32", True,
        )
        return jnp.sum(kv * kv) + jnp.sum(jnp.sin(kt))

    def loss_ref(v_, t_, ws, bs):
        rv, rt = _jnp_ref(v_, t_, dirs, ws, bs, "tanhExp")
        return jnp.sum(rv * rv) + jnp.sum(jnp.sin(rt[None]))

    args = (
        jnp.asarray(v), jnp.asarray(t),
        tuple(map(jnp.asarray, weights)), tuple(map(jnp.asarray, biases)),
    )
    # the context must wrap the grad CALL: custom_vjp backwards trace
    # when the cotangent program is built (see bwd_stash docstring)
    with matmul_dtype(jnp.float32):
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4,
            atol=5e-5 * max(1.0, float(jnp.abs(b).max())),
        )


def test_k1_pad_rows_roundtrip():
    x = jnp.ones((700, 16))
    xp, m = pad_rows(x)
    assert m == 700 and xp.shape[0] % 512 == 0
