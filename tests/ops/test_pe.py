import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.ops.pe import (
    pe_frequencies,
    pe_grad_scale,
    pe_lowpass_scale,
    pe_packed,
    pe_weights,
    positional_encoding,
    positional_encoding_mip,
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


# ---------------------------------------------------------------- packed
# Lane-packed PE must be BITWISE equal to the unpacked chain: identical
# per-element products, sin/cos calls and multiply order — only the vreg
# layout differs. N values cover no-pad (multiple of P), pad, and the
# N < P fallback.


@pytest.mark.parametrize("rank", [10, 4, 6])
@pytest.mark.parametrize("n", [512, 101, 3, 1])
def test_positional_encoding_mip_bitwise(rng, rank, n):
    x = rng.standard_normal((n, 3)).astype(np.float32) * 2.0
    var = np.abs(rng.standard_normal((n, 3))).astype(np.float32) * 0.01
    lowpass = np.asarray(pe_lowpass_scale(rank, rank / 2 + 0.3))
    with pe_packed(False):
        scale = jnp.asarray(lowpass) * pe_weights(jnp.asarray(var), rank)
        ref = np.asarray(positional_encoding(jnp.asarray(x), rank, scale))
    with pe_packed(True):
        got = np.asarray(
            positional_encoding_mip(
                jnp.asarray(x), rank,
                var=jnp.asarray(var), chan_scale=jnp.asarray(lowpass),
            )
        )
    assert got.shape == (n, 6 * rank)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("n", [512, 37])
def test_positional_encoding_mip_unscaled_bitwise(rng, n):
    x = rng.standard_normal((n, 3)).astype(np.float32)
    with pe_packed(False):
        ref = np.asarray(positional_encoding(jnp.asarray(x), 4))
    with pe_packed(True):
        got = np.asarray(positional_encoding_mip(jnp.asarray(x), 4))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("n", [512, 101, 2])
def test_pe_weights_packed_bitwise(rng, n):
    var = np.abs(rng.standard_normal((n, 3))).astype(np.float32) * 0.05
    with pe_packed(False):
        ref = np.asarray(pe_weights(jnp.asarray(var), 10))
    with pe_packed(True):
        got = np.asarray(pe_weights(jnp.asarray(var), 10))
    np.testing.assert_array_equal(got, ref)


def test_positional_encoding_mip_grad_matches(rng):
    """The packed path must stay differentiable with identical grads
    (camera-pose refinement backprops through the PE to positions)."""
    import jax

    x = rng.standard_normal((64, 3)).astype(np.float32)
    var = np.abs(rng.standard_normal((64, 3))).astype(np.float32) * 0.01
    lowpass = pe_lowpass_scale(10, 5.3)

    def loss_packed(xx):
        emb = positional_encoding_mip(
            xx, 10, var=jnp.asarray(var), chan_scale=lowpass
        )
        return jnp.sum(emb ** 2)

    def loss_ref(xx):
        return jnp.sum(
            positional_encoding(xx, 10, lowpass * pe_weights(jnp.asarray(var), 10)) ** 2
        )

    with pe_packed(True):
        g_packed = np.asarray(jax.grad(loss_packed)(jnp.asarray(x)))
    with pe_packed(False):
        g_ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(x)))
    np.testing.assert_allclose(g_packed, g_ref, rtol=1e-6, atol=1e-6)
