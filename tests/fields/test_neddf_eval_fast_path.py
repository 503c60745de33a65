"""NeDDF's need_aux=False eval fast path must reproduce the full apply's
color/density/distance/aux_grad exactly — it only skips the color-branch
Jacobian (whose sole consumer is the constraints_color penalty) and
returns fields_penalty as zeros."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.fields.neddf import NeDDF
from neddf_tpu.geometry.rays import Sampling
from neddf_tpu.kernels.dual_mlp import matmul_dtype


@pytest.mark.parametrize("fused", ["off", "on"])
def test_eval_fast_path_matches_full_apply(fused):
    field = NeDDF(
        embed_pos_rank=4, embed_dir_rank=2, ddf_layer_count=4,
        ddf_layer_width=16, col_layer_count=3, col_layer_width=16,
        skips=(1,), fused=fused,
    )
    params = field.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    samp = Sampling(
        sample_pos=jax.random.uniform(k, (4, 16, 3), minval=-1, maxval=1),
        sample_dir=jax.random.normal(k, (4, 16, 3)),
        diag_variance=jnp.abs(jax.random.normal(k, (4, 16, 3))) * 1e-4,
    )
    sched = field.schedule(-1)
    with matmul_dtype(jnp.float32):
        full = field.apply(params, samp, sched, need_aux=True)
        fast = field.apply(params, samp, sched, need_aux=False)
    for key in ("distance", "density", "aux_grad", "color"):
        np.testing.assert_allclose(
            np.asarray(full[key]), np.asarray(fast[key]), rtol=1e-5, atol=1e-6,
            err_msg=key,
        )
    assert np.all(np.asarray(fast["fields_penalty"]) == 0.0)
