"""Fused epilogue kernel == the unfused apply path (values + grads).

kernels/neddf_epilogue.py fuses heads + density + the four trunk
penalties + the color-tangent seed into one pass over the trunk
streams, with a hand-written VJP carrying the reference's
stop_gradient placements. These tests pin the FULL apply (and its
reverse-mode gradients through a rendering-style loss) against the
non-epilogue fused path and the jnp path, in f32 exactness mode."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neddf_tpu.fields.neddf as neddf_mod
from neddf_tpu.fields import NeDDF
from neddf_tpu.geometry.rays import Sampling
from neddf_tpu.kernels.dual_mlp import matmul_dtype

KW = dict(
    embed_pos_rank=4, embed_dir_rank=2, ddf_layer_count=4,
    ddf_layer_width=32, col_layer_count=3, col_layer_width=32, skips=(1,),
    fused="on",
    penalty_weight={
        "constraints_aux_grad": 0.05,
        "constraints_dDdt": 1.0,
        "constraints_color": 0.0001,
        "range_distance": 1.0,
        "range_aux_grad": 1.0,
        "range_color": 0.1,
    },
)
OUT_KEYS = ("distance", "density", "color", "fields_penalty", "aux_grad")


@pytest.fixture(scope="module")
def setup():
    field = NeDDF(**KW)
    params = field.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(9)
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


@pytest.mark.parametrize("iteration", [500, 20000])
def test_epilogue_apply_matches_unfused(setup, iteration):
    field, params, s = setup
    sched = field.schedule(jnp.int32(iteration))
    with matmul_dtype(jnp.float32):
        with neddf_mod.use_epilogue(True):
            got = field.apply(params, s, sched)
        with neddf_mod.use_epilogue(False):
            want = field.apply(params, s, sched)
    for k in OUT_KEYS:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=2e-4,
            atol=2e-5 * max(1.0, float(jnp.abs(want[k]).max())),
            err_msg=k,
        )


def test_epilogue_grads_match_unfused(setup):
    """Reverse-mode through a rendering-style loss touching EVERY
    output — the hand-written VJP must reproduce the sg placements."""
    field, params, s = setup
    sched = field.schedule(jnp.int32(500))

    def loss(p, field):
        out = field.apply(p, s, sched)
        return (
            jnp.sum(jnp.square(out["color"] - 0.5))
            + jnp.sum(out["density"] * 0.01)
            + jnp.sum(out["fields_penalty"]) * 0.01
            + jnp.sum(out["distance"]) * 1e-3
            + jnp.sum(out["aux_grad"]) * 1e-3
        )

    with matmul_dtype(jnp.float32):
        with neddf_mod.use_epilogue(True):
            g_epi = jax.grad(loss)(params, field)
        with neddf_mod.use_epilogue(False):
            g_ref = jax.grad(loss)(params, field)
    flat_e = jax.tree_util.tree_leaves(g_epi)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    for a, b in zip(flat_e, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3,
            atol=2e-5 * max(1.0, float(jnp.abs(b).max())),
        )


def test_epilogue_grads_match_jnp_path(setup):
    """Cross-check against the pure-jnp dual path too (independent of
    the other kernels)."""
    field, params, s = setup
    f_jnp = dataclasses.replace(field, fused="off")
    sched = field.schedule(jnp.int32(500))

    def loss(p, f):
        out = f.apply(p, s, sched)
        return jnp.sum(jnp.square(out["color"])) + jnp.sum(
            out["fields_penalty"]
        ) + jnp.sum(out["density"])

    with matmul_dtype(jnp.float32):
        with neddf_mod.use_epilogue(True):
            g_epi = jax.grad(loss)(params, field)
    g_ref = jax.grad(loss)(params, f_jnp)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_epi), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3,
            atol=3e-5 * max(1.0, float(jnp.abs(b).max())),
        )


def test_epilogue_eval_fast_path_untouched(setup):
    """need_aux=False must bypass the epilogue entirely."""
    field, params, s = setup
    sched = field.schedule(jnp.int32(-1))
    with matmul_dtype(jnp.float32):
        with neddf_mod.use_epilogue(True):
            a = field.apply(params, s, sched, need_aux=False)
        with neddf_mod.use_epilogue(False):
            b = field.apply(params, s, sched, need_aux=False)
    for k in ("density", "color", "distance"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
