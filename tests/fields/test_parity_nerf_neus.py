"""Numerical parity of the NeRF and NeuS families against the PyTorch
reference implementation (the NeDDF counterpart lives in
test_parity_pretrained.py, driven by the shipped checkpoint).

No pretrained NeRF/NeuS artifact exists in the reference repo, so the
weights travel the OTHER way: our randomly-initialised field is
exported through training/checkpoint.py::export_torch_state_dict and
strict-loaded into the reference's own torch module
(/root/reference/neddf/network/{nerf,neus}.py); both sides then
evaluate the same sampling batch. This pins PE layout, skip order
([hx, embed] for NeRF — nerf.py:152-155), density/color wiring,
NeuS's autograd normals + logistic density (neus.py:133-155), and the
exporter's key/layout mapping, end to end.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.geometry.rays import Sampling
from neddf_tpu.render import NeRFRender
from neddf_tpu.training.checkpoint import export_torch_state_dict

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "neddf")),
    reason="reference repo not mounted",
)

NERF_KW = dict(
    embed_pos_rank=10, embed_dir_rank=4, layer_count=8, layer_width=64,
    skips=[4], lowpass_alpha_offset=10.0,
)
NEUS_KW = dict(
    embed_pos_rank=6, embed_dir_rank=4, sdf_layer_count=4,
    sdf_layer_width=64, col_layer_count=4, col_layer_width=64, skips=[2],
)


def _sampling(rng, batch=2, samples=16):
    pos = (rng.standard_normal((batch, samples, 3)) * 0.4).astype(np.float32)
    direction = rng.standard_normal((batch, samples, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    var = np.abs(rng.standard_normal((batch, samples, 3))).astype(
        np.float32
    ) * 1e-4
    return pos, direction, var


def _export_into_torch(tmp_path, net_cfg, torch_net):
    """init our field -> export .pth -> strict-load into the reference
    torch module; returns (our renderer, our params)."""
    renderer = NeRFRender(
        network_config=net_cfg, sample_coarse=8, sample_fine=8,
        use_coarse_network=False,
    )
    params = renderer.init(jax.random.PRNGKey(7))
    out = tmp_path / "model_00001.pth"
    export_torch_state_dict(params, renderer, out)
    import torch

    sd = torch.load(str(out), map_location="cpu")
    torch_net.load_state_dict(
        {
            k[len("network_fine."):]: v
            for k, v in sd.items()
            if k.startswith("network_fine.")
        }
    )
    return renderer, params


def test_nerf_outputs_match_reference(tmp_path):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from neddf.network import NeRF as TorchNeRF
    from neddf.ray import Sampling as TorchSampling

    torch_net = TorchNeRF(**NERF_KW)
    cfg = {"_target_": "neddf_tpu.fields.NeRF", **NERF_KW}
    renderer, params = _export_into_torch(tmp_path, cfg, torch_net)
    field = renderer.network_fine

    rng = np.random.default_rng(3)
    pos, direction, var = _sampling(rng)
    with torch.no_grad():
        ref = torch_net(
            TorchSampling(
                torch.from_numpy(pos), torch.from_numpy(direction),
                torch.from_numpy(var),
            )
        )
    out = field.apply(
        params["network_fine"],
        Sampling(jnp.asarray(pos), jnp.asarray(direction), jnp.asarray(var)),
        field.schedule(-1),
    )
    np.testing.assert_allclose(
        np.asarray(out["density"]), ref["density"].numpy(), rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["color"]), ref["color"].numpy(), rtol=1e-4, atol=1e-5
    )


def test_nerf_warmup_schedule_matches_reference(tmp_path):
    """Mid-warmup lowpass window (set_iter) must agree too."""
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from neddf.network import NeRF as TorchNeRF
    from neddf.ray import Sampling as TorchSampling

    kw = dict(NERF_KW, lowpass_alpha_offset=2.0)
    torch_net = TorchNeRF(**kw)
    cfg = {"_target_": "neddf_tpu.fields.NeRF", **kw}
    renderer, params = _export_into_torch(tmp_path, cfg, torch_net)
    field = renderer.network_fine

    rng = np.random.default_rng(4)
    pos, direction, var = _sampling(rng)
    torch_net.set_iter(3000)  # alpha = 2.0 + 0.001*3000 = 5.0 (mid-band)
    with torch.no_grad():
        ref = torch_net(
            TorchSampling(
                torch.from_numpy(pos), torch.from_numpy(direction),
                torch.from_numpy(var),
            )
        )
    out = field.apply(
        params["network_fine"],
        Sampling(jnp.asarray(pos), jnp.asarray(direction), jnp.asarray(var)),
        field.schedule(3000),
    )
    np.testing.assert_allclose(
        np.asarray(out["density"]), ref["density"].numpy(), rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["color"]), ref["color"].numpy(), rtol=1e-4, atol=1e-5
    )


def test_neus_outputs_match_reference(tmp_path):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from neddf.network import NeuS as TorchNeuS
    from neddf.ray import Sampling as TorchSampling

    torch_net = TorchNeuS(**NEUS_KW)
    cfg = {"_target_": "neddf_tpu.fields.NeuS", **NEUS_KW}
    renderer, params = _export_into_torch(tmp_path, cfg, torch_net)
    field = renderer.network_fine

    rng = np.random.default_rng(5)
    pos, direction, var = _sampling(rng)
    # NeuS computes normals via autograd — NO no_grad here
    ref = torch_net(
        TorchSampling(
            torch.from_numpy(pos), torch.from_numpy(direction),
            torch.from_numpy(var),
        )
    )
    out = field.apply(
        params["network_fine"],
        Sampling(jnp.asarray(pos), jnp.asarray(direction), jnp.asarray(var)),
        field.schedule(-1),
    )
    np.testing.assert_allclose(
        np.asarray(out["sdf"]), ref["sdf"].detach().numpy(), rtol=1e-4,
        atol=1e-5,
    )
    # density = logistic(sdf; trainable s) — the autograd-normal path
    # feeds color, so color agreement also pins the gradient computation
    np.testing.assert_allclose(
        np.asarray(out["density"]), ref["density"].detach().numpy(),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["color"]), ref["color"].detach().numpy(), rtol=1e-4,
        atol=1e-5,
    )
