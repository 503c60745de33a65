"""NeDDF with the fused Pallas trunk == NeDDF with the jnp dual path.

End-to-end field check (distance, density, color, penalties) plus a
gradient check through the full output dict — the density depends on the
trunk's Jacobian output, so this exercises reverse-over-forward through
the kernel exactly as training does.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neddf_tpu.kernels.dual_mlp as kmod
from neddf_tpu.fields import NeDDF
from neddf_tpu.geometry.rays import Sampling

KW = dict(
    embed_pos_rank=4,
    embed_dir_rank=2,
    ddf_layer_count=4,
    ddf_layer_width=32,
    col_layer_count=3,
    col_layer_width=32,
    skips=(1,),
    d_near=0.001,
)


@pytest.fixture(scope="module")
def fields():
    return NeDDF(fused="off", **KW), NeDDF(fused="on", **KW)


@pytest.fixture(scope="module")
def data(fields):
    field_ref, _ = fields
    key = jax.random.PRNGKey(7)
    params = field_ref.init(key)
    rng = np.random.default_rng(3)
    b, s = 4, kmod.TILE_M // 4
    pos = jnp.asarray(rng.uniform(-1, 1, (b, s, 3)).astype(np.float32))
    direction = jnp.asarray(rng.normal(size=(b, s, 3)).astype(np.float32))
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    var = jnp.asarray(rng.uniform(0, 1e-4, (b, s, 3)).astype(np.float32))
    return params, Sampling(pos, direction, var)


def test_fused_matches_jnp_path(fields, data):
    field_ref, field_fused = fields
    params, sampling = data
    sched = field_ref.schedule(500)
    with kmod.matmul_dtype(jnp.float32):
        out_f = field_fused.apply(params, sampling, sched)
    out_r = field_ref.apply(params, sampling, sched)
    assert set(out_f) == set(out_r)
    for k in out_r:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_r[k]),
            rtol=1e-4, atol=1e-4, err_msg=k,
        )


def test_fused_gradients_match(fields, data):
    field_ref, field_fused = fields
    params, sampling = data
    sched = field_ref.schedule(500)

    def loss(field, p):
        out = field.apply(p, sampling, sched)
        return (
            jnp.mean(out["density"])
            + jnp.mean(jnp.square(out["color"]))
            + jnp.mean(out["fields_penalty"])
        )

    with kmod.matmul_dtype(jnp.float32):
        gf = jax.grad(lambda p: loss(field_fused, p))(params)
    gr = jax.grad(lambda p: loss(field_ref, p))(params)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    for (path, a), (_, b) in zip(flat_f, flat_r):
        scale = float(jnp.abs(b).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            rtol=1e-3, atol=1e-3 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_padded_row_count(fields):
    """M not a multiple of TILE_M exercises pad/unpad."""
    _, field_fused = fields
    key = jax.random.PRNGKey(0)
    params = field_fused.init(key)
    rng = np.random.default_rng(1)
    b, s = 3, 17
    sampling = Sampling(
        jnp.asarray(rng.uniform(-1, 1, (b, s, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, s, 3)).astype(np.float32)),
        jnp.zeros((b, s, 3), jnp.float32),
    )
    out = field_fused.apply(params, sampling, field_fused.schedule(-1))
    assert out["density"].shape == (b, s)
    assert bool(jnp.all(jnp.isfinite(out["density"])))


def test_fused_bf16_finite_and_close(fields, data):
    """Production bf16 path: outputs finite and near the f32 reference."""
    field_ref, _ = fields
    params, sampling = data
    field_bf = NeDDF(fused="on", compute_dtype="bfloat16", **KW)
    sched = field_ref.schedule(500)
    out_b = field_bf.apply(params, sampling, sched)
    out_r = field_ref.apply(params, sampling, sched)
    for k in out_r:
        arr = np.asarray(out_b[k], dtype=np.float32)
        assert np.all(np.isfinite(arr)), k
        ref = np.asarray(out_r[k])
        scale = np.abs(ref).max() + 1e-6
        assert np.median(np.abs(arr - ref)) < 2e-2 * scale, k

    def loss(field, p):
        out = field.apply(p, sampling, sched)
        return jnp.mean(out["density"]) + jnp.mean(jnp.square(out["color"]))

    g = jax.grad(lambda p: loss(field_bf, p))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))
