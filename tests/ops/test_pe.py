import jax.numpy as jnp
import numpy as np

from neddf_tpu.ops.pe import (
    pe_frequencies,
    pe_grad_scale,
    pe_lowpass_scale,
    pe_weights,
    positional_encoding,
)


def test_frequencies_no_pi():
    np.testing.assert_allclose(pe_frequencies(4), [1.0, 2.0, 4.0, 8.0])


def test_encoding_layout(rng):
    """Channel layout must be (t, i) row-major: p[:, t*3+i] = 2^t * x_i."""
    x = rng.standard_normal((2, 3)).astype(np.float32)
    enc = np.asarray(positional_encoding(jnp.asarray(x), 2))
    assert enc.shape == (2, 12)
    expect_sin = np.concatenate([np.sin(x), np.sin(2 * x)], axis=1)
    expect_cos = np.concatenate([np.cos(x), np.cos(2 * x)], axis=1)
    np.testing.assert_allclose(enc[:, :6], expect_sin, rtol=1e-6)
    np.testing.assert_allclose(enc[:, 6:], expect_cos, rtol=1e-6)


def test_lowpass_matches_reference_semantics():
    rank = 5
    # alpha >= rank -> all ones
    np.testing.assert_allclose(pe_lowpass_scale(rank, 5.0), np.ones((1, 15)))
    np.testing.assert_allclose(pe_lowpass_scale(rank, 7.3), np.ones((1, 15)))
    # fractional alpha: bands below floor pass, floor band cosine ramp, rest 1e-7
    alpha = 2.6
    s = np.asarray(pe_lowpass_scale(rank, alpha)).reshape(rank, 3)
    np.testing.assert_allclose(s[0], 1.0)
    np.testing.assert_allclose(s[1], 1.0)
    ramp = 0.5 * (1 - np.cos(np.pi * 0.6)) + 1e-7
    np.testing.assert_allclose(s[2], ramp, rtol=1e-5)
    np.testing.assert_allclose(s[3], 1e-7)
    np.testing.assert_allclose(s[4], 1e-7)
    # integer alpha: ramp band collapses to the 1e-7 floor value
    s = np.asarray(pe_lowpass_scale(rank, 2.0)).reshape(rank, 3)
    np.testing.assert_allclose(s[2], 1e-7, rtol=1e-3)


def test_grad_scale():
    s = np.asarray(pe_grad_scale(3)).reshape(3, 3)
    np.testing.assert_allclose(s[:, 0], [2.0, 1.0, 0.5])


def test_pe_weights_formula(rng):
    var = np.abs(rng.standard_normal((4, 3))).astype(np.float32) * 0.01
    w = np.asarray(pe_weights(jnp.asarray(var), 2))
    assert w.shape == (4, 6)
    expect = np.exp(-0.5 * np.concatenate([1.0 * var, 4.0 * var], axis=1))
    np.testing.assert_allclose(w, expect, rtol=1e-5)
