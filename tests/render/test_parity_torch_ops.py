"""Deterministic-op parity against the PyTorch reference: compositing
and the four loss classes, compared DIRECTLY on the same tensors.

integrate_volume_render (reference: neddf/render/base_neural_render.py:
117-172) and the loss forwards (neddf/loss/*.py) take no randomness, so
they pin bit-level semantics — the alpha/transmittance/weight chain
with its 1e-7 floor and the black-background depth term, and the
key-based loss dict protocol with *_coarse duplication — without any
checkpoint in the loop.
"""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.ops.compositing import integrate_volume_render
from neddf_tpu.training.losses import (
    ColorLoss,
    FieldsConstraintLoss,
    MaskBCELoss,
    MaskMSELoss,
)

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "neddf")),
    reason="reference repo not mounted",
)


@pytest.fixture(scope="module")
def torch_render():
    pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # neddf.render's __init__ imports NeRFRender which imports hydra
    # (absent in this env, and only used at instantiate-time); a bare
    # module stub satisfies the import without changing behaviour
    import types

    sys.modules.setdefault("hydra", types.ModuleType("hydra"))
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.DictConfig = dict
        sys.modules["omegaconf"] = om
    # the method under test lives on BaseNeuralRender and only reads
    # self.max_dist, so drive it through a minimal concrete subclass
    from neddf.render.base_neural_render import BaseNeuralRender

    class _Shim(BaseNeuralRender):
        def __init__(self):
            import torch.nn as nn

            nn.Module.__init__(self)
            self.max_dist = 6.0

        def get_parameters_list(self):  # pragma: no cover - unused
            return []

        def render_rays(self, *a, **k):  # pragma: no cover - unused
            raise NotImplementedError

        def integrate_volume_render_with_penalties(self, *a, **k):
            raise NotImplementedError  # pragma: no cover - unused

        def render_image(self, *a, **k):  # pragma: no cover - unused
            raise NotImplementedError

        def render_field_slice(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

    _Shim.__abstractmethods__ = frozenset()
    return _Shim()


def test_integrate_volume_render_matches_reference(torch_render):
    import torch

    rng = np.random.default_rng(11)
    B, S = 4, 32
    dists = np.sort(
        rng.uniform(0.1, 5.0, (B, S)).astype(np.float32), axis=1
    )
    dens = rng.uniform(0.0, 8.0, (B, S)).astype(np.float32)
    cols = rng.uniform(0.0, 1.0, (B, S, 3)).astype(np.float32)

    ref = torch_render.integrate_volume_render(
        torch.from_numpy(dists), torch.from_numpy(dens),
        torch.from_numpy(cols),
    )
    ours = integrate_volume_render(
        jnp.asarray(dists), jnp.asarray(dens), jnp.asarray(cols),
        max_dist=6.0,
    )
    for k in ("weight", "depth", "color", "transmittance"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), ref[k].numpy(), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )


@pytest.mark.parametrize(
    "ours_cls,ref_name,out_key,tgt_key,out_shape",
    [
        (ColorLoss, "ColorLoss", "color", "color", (8, 3)),
        (MaskBCELoss, "MaskBCELoss", "transmittance", "mask", (8,)),
        (MaskMSELoss, "MaskMSELoss", "transmittance", "mask", (8,)),
        (
            FieldsConstraintLoss,
            "FieldsConstraintLoss",
            "fields_penalty",
            "fields_penalty",
            (8,),
        ),
    ],
)
def test_losses_match_reference(ours_cls, ref_name, out_key, tgt_key,
                                out_shape):
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import neddf.loss as ref_loss_mod

    rng = np.random.default_rng(13)
    out = rng.uniform(0.05, 0.95, out_shape).astype(np.float32)
    out_coarse = rng.uniform(0.05, 0.95, out_shape).astype(np.float32)
    tgt = rng.uniform(0.0, 1.0, out_shape).astype(np.float32)

    ref_fn = getattr(ref_loss_mod, ref_name)(weight=0.7, weight_coarse=0.3)
    ours_fn = ours_cls(weight=0.7, weight_coarse=0.3)

    ref = ref_fn(
        {
            out_key: torch.from_numpy(out),
            f"{out_key}_coarse": torch.from_numpy(out_coarse),
        },
        {tgt_key: torch.from_numpy(tgt)},
    )
    got = ours_fn(
        {
            out_key: jnp.asarray(out),
            f"{out_key}_coarse": jnp.asarray(out_coarse),
        },
        {tgt_key: jnp.asarray(tgt)},
    )
    assert set(got) == set(ref.keys())
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), ref[k].numpy(), rtol=1e-5, atol=1e-7,
            err_msg=k,
        )


def test_sample_pdf_matches_reference(torch_render, monkeypatch):
    """Inverse-CDF hierarchical sampling vs the reference, with the SAME
    uniforms injected on both sides (torch.rand monkeypatched to return
    the draws our jax key produces): pins the +1e-2 floor, the
    cat_coarse=False 3-tap max-pool blur, searchsorted/interp semantics
    and the final re-sort, for both cat_coarse modes."""
    import jax
    import torch

    from neddf_tpu.ops.sampling import sample_pdf

    rng = np.random.default_rng(17)
    B, S, F = 4, 16, 24
    dists = np.sort(
        rng.uniform(0.5, 6.0, (B, S)).astype(np.float32), axis=1
    )
    weights = rng.uniform(0.0, 1.0, (B, S - 1)).astype(np.float32)

    key = jax.random.PRNGKey(17)
    u = np.asarray(jax.random.uniform(key, (B, F), dtype=jnp.float32))
    monkeypatch.setattr(
        torch, "rand", lambda *s, **k: torch.from_numpy(u.copy())
    )

    for cat_coarse in (True, False):
        ref = torch_render.sample_pdf(
            torch.from_numpy(dists.copy()),
            torch.from_numpy(weights.copy()),  # reference mutates in place
            F,
            cat_coarse=cat_coarse,
        )
        ours = sample_pdf(
            key, jnp.asarray(dists), jnp.asarray(weights), F,
            cat_coarse=cat_coarse,
        )
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"cat_coarse={cat_coarse}",
        )
