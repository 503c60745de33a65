"""Field contract + Jacobian-correctness tests (reference pattern:
tests/network/test_{neddf,nerf,neus}.py plus the with_grad FD harness)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.fields import NeDDF, NeRF, NeuS
from neddf_tpu.geometry.rays import Sampling


def make_sampling(rng, batch=2, samples=3):
    pos = rng.standard_normal((batch, samples, 3)).astype(np.float32) * 0.5
    direction = rng.standard_normal((batch, samples, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    return Sampling(
        sample_pos=jnp.asarray(pos),
        sample_dir=jnp.asarray(direction),
        diag_variance=jnp.zeros((batch, samples, 3), jnp.float32),
    )


@pytest.fixture(scope="module")
def small_neddf():
    return NeDDF(
        embed_pos_rank=4,
        embed_dir_rank=2,
        ddf_layer_count=4,
        ddf_layer_width=32,
        col_layer_count=3,
        col_layer_width=32,
        skips=(1,),
        d_near=0.001,
    )


def test_nerf_output_contract(key, rng):
    field = NeRF(embed_pos_rank=4, embed_dir_rank=2, layer_count=4,
                 layer_width=32, skips=(1,))
    params = field.init(key)
    s = make_sampling(rng)
    out = field.apply(params, s, field.schedule(-1))
    assert set(out) == {"density", "color"}
    assert out["density"].shape == (2, 3)
    assert out["color"].shape == (2, 3, 3)
    assert np.isfinite(np.asarray(out["density"])).all()
    assert (np.asarray(out["density"]) >= 0).all()  # ReLU density


def test_neddf_output_contract(key, rng, small_neddf):
    params = small_neddf.init(key)
    s = make_sampling(rng)
    out = small_neddf.apply(params, s, small_neddf.schedule(-1))
    assert set(out) == {"distance", "density", "color", "fields_penalty", "aux_grad"}
    for k in ["distance", "density", "fields_penalty", "aux_grad"]:
        assert out[k].shape == (2, 3), k
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert out["color"].shape == (2, 3, 3)
    assert (np.asarray(out["distance"]) > 0).all()  # softplus + d_near
    assert (np.asarray(out["fields_penalty"]) >= 0).all()


def test_neus_output_contract(key, rng):
    field = NeuS(embed_pos_rank=3, embed_dir_rank=2, sdf_layer_count=3,
                 sdf_layer_width=16, col_layer_count=2, col_layer_width=16, skips=(1,))
    params = field.init(key)
    s = make_sampling(rng)
    out = field.apply(params, s, field.schedule(-1))
    assert set(out) == {"sdf", "density", "color"}
    assert out["density"].shape == (2, 3)
    assert (np.asarray(out["density"]) > 0).all()  # logistic density


def test_neddf_distance_grad_is_true_jacobian(key, rng, small_neddf):
    """The dual-propagated grad(D) must equal finite differences of the
    distance output w.r.t. position — the core NeDDF property."""
    field = small_neddf
    params = field.init(key)
    sched = field.schedule(-1)

    pos = rng.standard_normal((1, 4, 3)).astype(np.float32) * 0.3

    def distance_of(p):
        s = Sampling(
            sample_pos=jnp.asarray(p),
            sample_dir=jnp.zeros((1, 4, 3), jnp.float32).at[..., 2].set(1.0),
            diag_variance=jnp.zeros((1, 4, 3), jnp.float32),
        )
        return np.asarray(field.apply(params, s, sched)["distance"])

    # recover grad D from the density equation is circular; instead check
    # density: density = relu((1/D)(1 - ||[gradD, aux]||)). We extract
    # gradD via FD of D and recompute dDdt, then compare densities.
    s = Sampling(
        sample_pos=jnp.asarray(pos),
        sample_dir=jnp.zeros((1, 4, 3), jnp.float32).at[..., 2].set(1.0),
        diag_variance=jnp.zeros((1, 4, 3), jnp.float32),
    )
    out = field.apply(params, s, sched)

    eps = 1e-3
    grads = []
    for a in range(3):
        dp = np.zeros_like(pos)
        dp[..., a] = eps
        grads.append((distance_of(pos + dp) - distance_of(pos - dp)) / (2 * eps))
    grad_fd = np.stack(grads, axis=-1)  # [1, 4, 3]

    d = np.asarray(out["distance"])[..., None]
    aux = np.asarray(out["aux_grad"])[..., None]
    nabla = np.concatenate([grad_fd, aux], axis=-1)
    dddt = np.linalg.norm(nabla, axis=-1)
    dens_fd = np.maximum((1.0 / d[..., 0]) * (1.0 - dddt), 0.0)
    np.testing.assert_allclose(
        np.asarray(out["density"]), dens_fd, rtol=5e-2, atol=5e-3
    )


def test_neddf_trainable_end_to_end(key, rng, small_neddf):
    """Gradients through density (reverse-over-forward) are finite and
    reduce a toy loss when applied."""
    field = small_neddf
    params = field.init(key)
    s = make_sampling(rng, batch=4, samples=8)
    sched = field.schedule(100)

    def loss_fn(p):
        out = field.apply(p, s, sched)
        return (
            jnp.mean(jnp.square(out["density"] - 0.5))
            + jnp.mean(out["fields_penalty"])
            + jnp.mean(jnp.square(out["color"]))
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)

    params2 = jax.tree_util.tree_map(lambda p, g: p - 1e-2 * g, params, grads)
    assert float(loss_fn(params2)) < float(loss)


def test_neus_gradients_finite(key, rng):
    field = NeuS(embed_pos_rank=3, embed_dir_rank=2, sdf_layer_count=3,
                 sdf_layer_width=16, col_layer_count=2, col_layer_width=16, skips=(1,))
    params = field.init(key)
    s = make_sampling(rng)

    def loss_fn(p):
        out = field.apply(p, s, field.schedule(0))
        return jnp.mean(jnp.square(out["density"])) + jnp.mean(out["color"])

    grads = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_neddf_schedule_warmups(small_neddf):
    sched0 = small_neddf.schedule(0)
    assert float(sched0.aux_grad_scale) == pytest.approx(0.01)
    sched_mid = small_neddf.schedule(5000)
    assert float(sched_mid.aux_grad_scale) == pytest.approx(0.5)
    sched_eval = small_neddf.schedule(-1)
    assert float(sched_eval.aux_grad_scale) == pytest.approx(1.1)
    assert float(sched_eval.lowpass_alpha) == small_neddf.embed_pos_rank


def test_lowpass_rate_configurable(small_neddf):
    """BARF-style annealing knob: lowpass_alpha = offset + rate * iter
    (reference hardcodes rate=1e-3, neddf.py:311-326); eval (-1) stays
    pinned to full rank regardless."""
    import dataclasses

    from neddf_tpu.fields import NeRF

    slow = dataclasses.replace(
        small_neddf, lowpass_alpha_offset=2.0, lowpass_alpha_rate=2e-4
    )
    assert float(slow.schedule(0).lowpass_alpha) == pytest.approx(2.0)
    assert float(slow.schedule(10000).lowpass_alpha) == pytest.approx(4.0)
    assert float(slow.schedule(-1).lowpass_alpha) == slow.embed_pos_rank
    nerf = NeRF(layer_count=2, layer_width=8,
                lowpass_alpha_offset=1.0, lowpass_alpha_rate=1e-4)
    assert float(nerf.schedule(20000).lowpass_alpha) == pytest.approx(3.0)
