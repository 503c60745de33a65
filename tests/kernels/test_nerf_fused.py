"""NeRF with the fused plain-MLP trunk == NeRF with the jnp path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neddf_tpu.kernels.mlp as kmlp
from neddf_tpu.fields import NeRF
from neddf_tpu.geometry.rays import Sampling
from neddf_tpu.kernels.dual_mlp import matmul_dtype

KW = dict(embed_pos_rank=4, embed_dir_rank=2, layer_count=4, layer_width=32,
          skips=(1,))


@pytest.fixture(scope="module")
def data():
    field = NeRF(fused="off", **KW)
    key = jax.random.PRNGKey(11)
    params = field.init(key)
    rng = np.random.default_rng(5)
    b, s = 4, kmlp.TILE_M // 4 + 3  # exercises pad/unpad too
    pos = jnp.asarray(rng.uniform(-1, 1, (b, s, 3)).astype(np.float32))
    d = rng.normal(size=(b, s, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return params, Sampling(pos, jnp.asarray(d), jnp.zeros((b, s, 3), jnp.float32))


def test_fused_matches_jnp(data):
    params, sampling = data
    ref = NeRF(fused="off", **KW)
    fus = NeRF(fused="on", **KW)
    sched = ref.schedule(100)
    out_r = ref.apply(params, sampling, sched)
    with matmul_dtype(jnp.float32):
        out_f = fus.apply(params, sampling, sched)
    for k in out_r:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_r[k]),
            rtol=1e-4, atol=1e-4, err_msg=k,
        )


def test_fused_gradients_match(data):
    params, sampling = data
    ref = NeRF(fused="off", **KW)
    fus = NeRF(fused="on", **KW)
    sched = ref.schedule(100)

    def loss(field, p):
        out = field.apply(p, sampling, sched)
        return jnp.mean(out["density"]) + jnp.mean(jnp.square(out["color"]))

    with matmul_dtype(jnp.float32):
        gf = jax.grad(lambda p: loss(fus, p))(params)
    gr = jax.grad(lambda p: loss(ref, p))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gf)[0],
        jax.tree_util.tree_flatten_with_path(gr)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            rtol=1e-3, atol=1e-3 * (float(jnp.abs(b).max()) + 1e-9),
            err_msg=jax.tree_util.keystr(path),
        )


def test_neus_fused_color_matches(data):
    """NeuS with the fused color branch == jnp path (incl. gradients
    through the second-order trunk normals)."""
    from neddf_tpu.fields import NeuS

    kw = dict(embed_pos_rank=3, embed_dir_rank=2, sdf_layer_count=3,
              sdf_layer_width=32, col_layer_count=3, col_layer_width=32,
              skips=(1,))
    ref = NeuS(fused="off", **kw)
    fus = NeuS(fused="on", **kw)
    _, sampling = data
    params = ref.init(jax.random.PRNGKey(2))
    sched = ref.schedule(0)
    out_r = ref.apply(params, sampling, sched)
    with matmul_dtype(jnp.float32):
        out_f = fus.apply(params, sampling, sched)
    for k in out_r:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_r[k]),
            rtol=1e-4, atol=1e-4, err_msg=k,
        )

    def loss(field, p):
        out = field.apply(p, sampling, sched)
        return jnp.mean(jnp.square(out["color"])) + jnp.mean(out["density"])

    with matmul_dtype(jnp.float32):
        gf = jax.grad(lambda p: loss(fus, p))(params)
    gr = jax.grad(lambda p: loss(ref, p))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gf)[0],
        jax.tree_util.tree_flatten_with_path(gr)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            rtol=1e-3, atol=1e-3 * (float(jnp.abs(b).max()) + 1e-9),
            err_msg=jax.tree_util.keystr(path),
        )
