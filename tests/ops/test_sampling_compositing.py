import jax
import jax.numpy as jnp
import numpy as np

from neddf_tpu.ops.compositing import integrate_volume_render
from neddf_tpu.ops.sampling import sample_pdf, stratified_dists


def test_stratified_dists_range(key):
    d = np.asarray(stratified_dists(key, 16, 64, 2.0, 6.0))
    assert d.shape == (16, 65)
    assert (np.diff(d, axis=1) > -1e-6).all() is not False  # near-sorted bins
    assert d.min() >= 2.0 and d.max() <= 6.0 + (4.0 / 64) + 1e-5


def test_sample_pdf_shapes_and_sorted(key):
    b, s, nf = 4, 65, 129
    dists = jnp.broadcast_to(jnp.linspace(2.0, 6.0, s)[None], (b, s))
    weights = jax.random.uniform(key, (b, s - 1))
    out = sample_pdf(key, dists, weights, nf)
    assert out.shape == (b, s + nf)
    d = np.asarray(out)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    assert np.isfinite(d).all()
    assert d.min() >= 2.0 - 1e-5 and d.max() <= 6.0 + 1e-5


def test_sample_pdf_handles_bad_weights(key):
    b, s = 2, 9
    dists = jnp.broadcast_to(jnp.linspace(2.0, 6.0, s)[None], (b, s))
    weights = jnp.array([[np.nan, -1.0, 0.0, 1.0, 0.0, 0.0, np.nan, -5.0]] * b)
    out = np.asarray(sample_pdf(key, dists, weights, 8))
    assert np.isfinite(out).all()


def test_sample_pdf_concentrates_on_peak(key):
    """Most fine samples should land in the high-weight interval."""
    b, s, nf = 1, 33, 128
    dists = jnp.broadcast_to(jnp.linspace(2.0, 6.0, s)[None], (b, s))
    weights = jnp.zeros((b, s - 1)).at[:, 16].set(100.0)
    out = np.asarray(sample_pdf(key, dists, weights, nf, cat_coarse=False))
    lo, hi = np.asarray(dists)[0, 16], np.asarray(dists)[0, 17]
    frac = ((out >= lo) & (out <= hi)).mean()
    assert frac > 0.5


def test_inverse_cdf_matches_gather_formulation(rng):
    """The gather-free clipped-ramp inverse CDF == searchsorted+lerp."""
    from neddf_tpu.ops.sampling import _inverse_cdf

    b, s, k = 8, 17, 33
    dists = jnp.asarray(np.sort(rng.uniform(2, 6, (b, s)).astype(np.float32), axis=1))
    w = jnp.asarray(rng.uniform(0, 1, (b, s - 1)).astype(np.float32)) + 1e-2
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros((b, 1)), jnp.cumsum(pdf, axis=-1)], axis=-1)
    u = jnp.asarray(rng.uniform(0, 1, (b, k)).astype(np.float32))

    got = np.asarray(_inverse_cdf(dists, cdf, u))

    ids = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1).astype(jnp.int32)
    below = jnp.maximum(ids - 1, 0)
    above = jnp.minimum(ids, s - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    d_b = jnp.take_along_axis(dists, below, axis=-1)
    d_a = jnp.take_along_axis(dists, above, axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    want = np.asarray(d_b + (u - cdf_b) / denom * (d_a - d_b))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # monotone in u per row
    order = np.argsort(np.asarray(u), axis=1)
    srt = np.take_along_axis(got, order, axis=1)
    assert (np.diff(srt, axis=1) >= -1e-5).all()


def test_integrate_volume_render_semantics():
    b, s = 3, 8
    dists = jnp.broadcast_to(jnp.linspace(2.0, 6.0, s)[None], (b, s))
    colors = jnp.ones((b, s, 3)) * 0.5

    # zero density -> transparent: T=~1, depth ~= max_dist, color ~= 0
    out = integrate_volume_render(dists, jnp.zeros((b, s)), colors, 6.0)
    assert out["weight"].shape == (b, s - 1)
    np.testing.assert_allclose(out["transmittance"], 1.0, atol=1e-4)
    np.testing.assert_allclose(out["depth"], 6.0, rtol=1e-3)
    np.testing.assert_allclose(out["color"], 0.0, atol=1e-3)

    # huge density at front -> opaque at first sample
    dens = jnp.zeros((b, s)).at[:, 0].set(1e4)
    out = integrate_volume_render(dists, dens, colors, 6.0)
    np.testing.assert_allclose(out["transmittance"], 0.0, atol=1e-3)
    np.testing.assert_allclose(out["depth"], 2.0, rtol=1e-3)
    np.testing.assert_allclose(out["color"], 0.5, rtol=1e-3)


def test_integrate_matches_manual_cumprod(rng):
    """exp(cumsum(log)) formulation == naive cumprod reference."""
    b, s = 4, 16
    dists = np.sort(rng.uniform(2, 6, (b, s)).astype(np.float32), axis=1)
    dens = np.abs(rng.standard_normal((b, s)).astype(np.float32))
    cols = rng.uniform(0, 1, (b, s, 3)).astype(np.float32)

    out = integrate_volume_render(
        jnp.asarray(dists), jnp.asarray(dens), jnp.asarray(cols), 6.0
    )

    deltas = dists[:, 1:] - dists[:, :-1]
    o = 1 - np.exp(-dens[:, :-1] * deltas)
    t = np.cumprod(np.concatenate([np.ones((b, 1)), 1 - o + 1e-7], axis=1), axis=1)
    w = o * t[:, :-1]
    np.testing.assert_allclose(out["weight"], w, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        out["depth"], (w * dists[:, :-1]).sum(1) + t[:, -1] * 6.0, rtol=1e-4
    )
    np.testing.assert_allclose(
        out["color"], (w[:, :, None] * cols[:, :-1]).sum(1), rtol=1e-4, atol=1e-6
    )
