"""Dual-activation parity against the reference's hand-written
GradFunctions (neddf/nn_module/with_grad/*.py) for every activation in
the reference's ActivationType set.

Each reference GradFunction propagates (y, G) = (f(x), f'(x)*J) forward
and hand-implements the backward INCLUDING the second-derivative
coupling dG/dx = f''(x)*J. Our kernel-side (f, f', f'') triples
(kernels/dual_mlp.py::_act_fns) must reproduce both: forward values AND
the full reverse-mode gradients of a loss touching y and G, compared
against torch.autograd through the reference Functions.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.kernels.dual_mlp import _act_fns

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "neddf")),
    reason="reference repo not mounted",
)

NAMES = {
    "ReLU": "ReLUGradFunction",
    "LeakyReLU": "LeakyReLUGradFunction",
    "tanhExp": "TanhExpGradFunction",
    "Sigmoid": "SigmoidGradFunction",
    "Softplus": "SoftplusGradFunction",
}


@pytest.mark.parametrize(
    "name",
    [
        n if n != "Sigmoid" else pytest.param(
            n,
            marks=pytest.mark.xfail(
                reason="REFERENCE BUG: SigmoidGradFunction broadcasts "
                "f'(x) with unsqueeze(2) instead of unsqueeze(1) "
                "(with_grad/sigmoid.py:42) — it raises for input_ch != 3 "
                "and would transpose the chain rule even at C == 3. "
                "Latent in the reference (no shipped config selects "
                "Sigmoid); our implementation is the correct chain rule, "
                "finite-difference-verified in tests/ops/test_dual.py.",
                raises=(RuntimeError, AssertionError),
                strict=True,
            ),
        )
        for n in sorted(NAMES)
    ],
)
def test_dual_activation_matches_reference(name):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import neddf.nn_module.with_grad as wg

    ref_fn = getattr(wg, NAMES[name])

    rng = np.random.default_rng(41)
    x_np = (rng.standard_normal((8, 12)) * 2.0).astype(np.float32)
    j_np = rng.standard_normal((8, 3, 12)).astype(np.float32)
    gy_np = rng.standard_normal((8, 12)).astype(np.float32)
    gg_np = rng.standard_normal((8, 3, 12)).astype(np.float32)

    # ---- reference: forward + autograd backward --------------------
    xt = torch.from_numpy(x_np.copy()).requires_grad_(True)
    jt = torch.from_numpy(j_np.copy()).requires_grad_(True)
    y_ref, g_ref = ref_fn.apply(xt, jt)
    dx_ref, dj_ref = torch.autograd.grad(
        (y_ref, g_ref),
        (xt, jt),
        (torch.from_numpy(gy_np), torch.from_numpy(gg_np)),
    )

    # ---- ours: (f, f', f'') triple ----------------------------------
    f, df, _ = _act_fns(name)

    def fwd(x, j):
        return f(x), df(x)[:, None, :] * j

    y, g = fwd(jnp.asarray(x_np), jnp.asarray(j_np))
    np.testing.assert_allclose(
        np.asarray(y), y_ref.detach().numpy(), rtol=1e-5, atol=1e-6,
        err_msg="y",
    )
    np.testing.assert_allclose(
        np.asarray(g), g_ref.detach().numpy(), rtol=1e-5, atol=1e-6,
        err_msg="G",
    )

    _, vjp = jax.vjp(fwd, jnp.asarray(x_np), jnp.asarray(j_np))
    dx, dj = vjp((jnp.asarray(gy_np), jnp.asarray(gg_np)))
    np.testing.assert_allclose(
        np.asarray(dx), dx_ref.numpy(), rtol=1e-4, atol=1e-5, err_msg="dx"
    )
    np.testing.assert_allclose(
        np.asarray(dj), dj_ref.numpy(), rtol=1e-5, atol=1e-6, err_msg="dJ"
    )


def test_linear_grad_layer_matches_reference():
    """LinearGradFunction (value + tangent matmuls, custom backward
    accumulating dW from BOTH streams — linear.py:72-84) vs our
    linear_dual under jax.vjp, same cotangents."""
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from neddf.nn_module.with_grad.linear import LinearGradFunction

    from neddf_tpu.ops.dual import linear_dual, pack_dual

    rng = np.random.default_rng(43)
    x_np = rng.standard_normal((8, 12)).astype(np.float32)
    j_np = rng.standard_normal((8, 3, 12)).astype(np.float32)
    w_np = (rng.standard_normal((12, 5)) * 0.4).astype(np.float32)
    b_np = rng.standard_normal((5,)).astype(np.float32)
    gy_np = rng.standard_normal((8, 5)).astype(np.float32)
    gg_np = rng.standard_normal((8, 3, 5)).astype(np.float32)

    xt = torch.from_numpy(x_np.copy()).requires_grad_(True)
    jt = torch.from_numpy(j_np.copy()).requires_grad_(True)
    wt = torch.from_numpy(w_np.copy()).requires_grad_(True)
    bt = torch.from_numpy(b_np.copy()).requires_grad_(True)
    y_ref, g_ref = LinearGradFunction.apply(xt, jt, wt, bt)
    dx_ref, dj_ref, dw_ref, db_ref = torch.autograd.grad(
        (y_ref, g_ref), (xt, jt, wt, bt),
        (torch.from_numpy(gy_np), torch.from_numpy(gg_np)),
    )

    def fwd(x, j, w, b):
        d = linear_dual(pack_dual(x, j), w, b)
        return d[:, 0, :], d[:, 1:, :]

    (y, g), vjp = jax.vjp(
        fwd, jnp.asarray(x_np), jnp.asarray(j_np), jnp.asarray(w_np),
        jnp.asarray(b_np),
    )
    np.testing.assert_allclose(np.asarray(y), y_ref.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), g_ref.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    dx, dj, dw, db = vjp((jnp.asarray(gy_np), jnp.asarray(gg_np)))
    for name, a, b_ in (
        ("dx", dx, dx_ref), ("dJ", dj, dj_ref), ("dW", dw, dw_ref),
        ("db", db, db_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), b_.numpy(), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_pe_grad_layer_matches_reference():
    """PositionalEncodingGradLayer (no-pi freqs, per-band 1/(0.5f) grad
    equaliser, per-sample scale applied to y AND G) vs pe_dual."""
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from neddf.nn_module.with_grad import PositionalEncodingGradLayer

    from neddf_tpu.ops.dual import pe_dual
    from neddf_tpu.ops.pe import pe_grad_scale, pe_lowpass_scale

    rank = 5
    layer = PositionalEncodingGradLayer(rank)

    rng = np.random.default_rng(47)
    x_np = (rng.standard_normal((8, 3)) * 0.8).astype(np.float32)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (8, 3, 3)).copy()

    gs = pe_grad_scale(rank)
    lp = pe_lowpass_scale(rank, 3.3)
    scale = np.asarray(gs * lp, np.float32)  # [1, 3R]
    scale_t = torch.from_numpy(np.broadcast_to(scale, (8, 3 * rank)).copy())

    with torch.no_grad():
        y_ref, g_ref = layer(
            torch.from_numpy(x_np.copy()), torch.from_numpy(eye), scale_t
        )
    d = pe_dual(jnp.asarray(x_np), rank, jnp.asarray(scale))
    np.testing.assert_allclose(
        np.asarray(d[:, 0, :]), y_ref.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(d[:, 1:, :]), g_ref.numpy(), rtol=1e-5, atol=1e-6
    )
