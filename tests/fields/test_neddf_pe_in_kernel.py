"""Field-level equivalence of the PE-fusion modes.

fields/neddf.py can feed the fused kernels either XLA-expanded
encodings (default, "off" — measured fastest on v5e) or RAW pos/var/
seed arrays that expand inside the kernel ("trunk"/"both",
kernels/dual_mlp.py in-kernel PE). All modes must produce the same
NeDDF.apply outputs and parameter gradients; this pins the full field
plumbing (padding, chunking, aux threading, epilogue interplay) on the
interpreter-kernel path in f32 exactness mode.
"""
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
)


@pytest.fixture(scope="module")
def setup():
    field = NeDDF(**KW)
    params = field.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(9)
    s = Sampling(
        sample_pos=jnp.asarray(
            rng.uniform(-1.2, 1.2, (2, 8, 3)).astype(np.float32)
        ),
        sample_dir=jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32)),
        diag_variance=jnp.abs(
            jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32))
        )
        * 1e-4,
    )
    return field, params, s


def _run(field, params, s, mode, need_aux=True):
    with neddf_mod.pe_in_kernel(mode), matmul_dtype(jnp.float32):
        return field.apply(params, s, field.schedule(100), need_aux=need_aux)


def _grads(field, params, s, mode):
    def loss(p):
        out = _run(field, p, s, mode)
        return (
            jnp.sum(out["density"])
            + jnp.sum(out["color"])
            + jnp.sum(out["fields_penalty"])
            + jnp.sum(out["distance"])
        )

    return jax.grad(loss)(params)


@pytest.mark.parametrize("mode", ["trunk", "both"])
def test_pe_mode_outputs_match(setup, mode):
    field, params, s = setup
    ref = _run(field, params, s, "off")
    got = _run(field, params, s, mode)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), rtol=1e-6, atol=1e-6,
            err_msg=f"{mode}:{k}",
        )


@pytest.mark.parametrize("mode", ["trunk", "both"])
def test_pe_mode_grads_match(setup, mode):
    field, params, s = setup
    g_ref = _grads(field, params, s, "off")
    g_got = _grads(field, params, s, mode)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_got, _ = jax.tree_util.tree_flatten(g_got)
    for a, b in zip(flat_ref, flat_got):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=3e-6,
            atol=3e-6,
        )


def test_pe_mode_eval_fast_path(setup):
    """need_aux=False keeps the XLA-side PE on every mode (the value-only
    color kernel has no PE support) — outputs must still agree."""
    field, params, s = setup
    ref = _run(field, params, s, "off", need_aux=False)
    got = _run(field, params, s, "both", need_aux=False)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), rtol=1e-6, atol=1e-6,
            err_msg=k,
        )
