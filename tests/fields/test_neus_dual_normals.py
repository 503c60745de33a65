"""NeuS normals: the fused dual-Jacobian trunk must reproduce the
reference's reverse-mode formulation (torch.autograd.grad,
neus.py:133-142) — both are exact derivatives of the same network, so
values agree to FP noise, and the OUTER loss gradient (reverse through
the normals, i.e. second-order) must agree too."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.fields.neus import NeuS
from neddf_tpu.geometry.rays import Sampling
from neddf_tpu.kernels.dual_mlp import matmul_dtype


@pytest.fixture(scope="module")
def setup():
    field_rev = NeuS(
        embed_pos_rank=4, embed_dir_rank=2, sdf_layer_count=4,
        sdf_layer_width=32, col_layer_count=3, col_layer_width=32,
        skips=(1,), normals="reverse", fused="off",
    )
    field_dual = NeuS(
        embed_pos_rank=4, embed_dir_rank=2, sdf_layer_count=4,
        sdf_layer_width=32, col_layer_count=3, col_layer_width=32,
        skips=(1,), normals="dual", fused="off",
    )
    params = field_rev.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    samp = Sampling(
        sample_pos=jax.random.uniform(k, (4, 16, 3), minval=-1, maxval=1),
        sample_dir=jax.random.normal(k, (4, 16, 3)),
        diag_variance=jnp.zeros((4, 16, 3)),
    )
    return field_rev, field_dual, params, samp


def test_dual_normals_match_reverse(setup):
    field_rev, field_dual, params, samp = setup
    with matmul_dtype(jnp.float32):
        out_r = field_rev.apply(params, samp, None)
        out_d = field_dual.apply(params, samp, None)
    for k in ("sdf", "density", "color"):
        np.testing.assert_allclose(
            np.asarray(out_r[k]), np.asarray(out_d[k]), rtol=1e-4, atol=1e-5
        )


def test_dual_normals_outer_gradients_match(setup):
    field_rev, field_dual, params, samp = setup

    def loss(field, p):
        out = field.apply(p, samp, None)
        return (jnp.mean(jnp.square(out["color"])) +
                jnp.mean(out["density"]) + jnp.mean(out["sdf"]))

    with matmul_dtype(jnp.float32):
        gr = jax.grad(lambda p: loss(field_rev, p))(params)
        gd = jax.grad(lambda p: loss(field_dual, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


@pytest.fixture(scope="module")
def sweep_setup(setup):
    field_rev, _, params, samp = setup
    field_sweep = NeuS(
        embed_pos_rank=4, embed_dir_rank=2, sdf_layer_count=4,
        sdf_layer_width=32, col_layer_count=3, col_layer_width=32,
        skips=(1,), normals="sweep", fused="off",
    )
    return field_rev, field_sweep, params, samp


def test_sweep_normals_match_reverse(sweep_setup):
    """normals="sweep" (fused reverse-sweep kernel, kernels/sdf_mlp.py)
    == reverse-mode through the plain trunk, values and outputs."""
    field_rev, field_sweep, params, samp = sweep_setup
    with matmul_dtype(jnp.float32):
        out_r = field_rev.apply(params, samp, None)
        out_s = field_sweep.apply(params, samp, None)
    for k in ("sdf", "density", "color"):
        np.testing.assert_allclose(
            np.asarray(out_r[k]), np.asarray(out_s[k]), rtol=1e-4,
            atol=1e-5, err_msg=k,
        )


def test_sweep_normals_outer_gradients_match(sweep_setup):
    """Second order: outer loss gradients through the sweep kernel's
    hand-written VJP == through jax's reverse-over-reverse."""
    field_rev, field_sweep, params, samp = sweep_setup

    def loss(field, p):
        out = field.apply(p, samp, None)
        return (jnp.mean(jnp.square(out["color"])) +
                jnp.mean(out["density"]) + jnp.mean(out["sdf"]))

    with matmul_dtype(jnp.float32):
        gr = jax.grad(lambda p: loss(field_rev, p))(params)
        gs = jax.grad(lambda p: loss(field_sweep, p))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gs)
    ):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=3e-5,
            atol=3e-5,
        )


def test_auto_normals_resolution(monkeypatch):
    """normals="auto" = the measured-fastest mode per backend: the
    fused sweep kernel on TPU (1.38x the reverse trunk on v5e, see
    kernels/sdf_mlp.py STATUS), reverse-mode elsewhere; TP always
    forces the jnp reverse trunk (no Pallas under shard_map)."""
    auto = NeuS(normals="auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert auto._use_sweep_normals() and not auto._use_dual_normals()
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not auto._use_sweep_normals() and not auto._use_dual_normals()
    tp = NeuS(normals="auto", tp_axis="model")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not tp._use_sweep_normals() and not tp._use_dual_normals()
