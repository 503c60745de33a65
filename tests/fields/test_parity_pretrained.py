"""Numerical parity against the PyTorch reference implementation.

Loads the shipped pretrained bunny_smoke checkpoint
(/root/reference/pretrained/bunny_smoke/models/model_02000.pth) into BOTH
the reference NeDDF (torch, CPU) and our JAX NeDDF, evaluates the same
sample batch, and requires distance/density/color/aux_grad agreement.
This exercises every parity-critical detail at once: PE layout, grad
scales, dual propagation, density equation, color-branch wiring and the
checkpoint importer.
"""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

PTH = "/root/reference/pretrained/bunny_smoke/models/model_02000.pth"

import os  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(PTH),
    reason="reference pretrained checkpoint not mounted",
)

NEDDF_KW = dict(
    embed_pos_rank=10,
    embed_dir_rank=4,
    ddf_layer_count=8,
    ddf_layer_width=256,
    col_layer_count=4,
    col_layer_width=256,
    d_near=0.001,
    activation_type="tanhExp",
    density_activation_type="LeakyReLU",  # pretrained run used LeakyReLU
    lowpass_alpha_offset=10,
)
PENALTY_WEIGHT = {
    "constraints_aux_grad": 0.05,
    "constraints_dDdt": 1.0,
    "constraints_color": 0.0001,
    "range_distance": 1.0,
    "range_aux_grad": 1.0,
    "range_color": 0.1,
}


@pytest.fixture(scope="module")
def reference_net():
    torch = pytest.importorskip("torch")
    from neddf.network import NeDDF as TorchNeDDF  # reference package

    net = TorchNeDDF(penalty_weight=PENALTY_WEIGHT, **NEDDF_KW)
    sd = torch.load(PTH, map_location="cpu")
    net.load_state_dict(
        {k[len("network_fine."):]: v for k, v in sd.items()
         if k.startswith("network_fine.")}
    )
    net.eval()
    net.set_iter(-1)
    return net


@pytest.fixture(scope="module")
def jax_setup():
    from neddf_tpu.render import NeRFRender
    from neddf_tpu.training.checkpoint import import_torch_state_dict

    renderer = NeRFRender(
        network_config={
            "_target_": "neddf_tpu.fields.NeDDF",
            "penalty_weight": PENALTY_WEIGHT,
            **NEDDF_KW,
        },
        use_coarse_network=False,
        sampling_type="cone",
        sample_coarse=64,
        sample_fine=128,
    )
    params = import_torch_state_dict(PTH, renderer)
    return renderer, params


def test_field_outputs_match_reference(reference_net, jax_setup, rng):
    import torch

    from neddf_tpu.geometry.rays import Sampling

    renderer, params = jax_setup
    field = renderer.network_fine

    pos = (rng.standard_normal((1, 64, 3)) * 0.4).astype(np.float32)
    direction = rng.standard_normal((1, 64, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    var = np.abs(rng.standard_normal((1, 64, 3))).astype(np.float32) * 1e-4

    # reference forward
    from neddf.ray import Sampling as TorchSampling

    with torch.no_grad():
        ref = reference_net(
            TorchSampling(
                torch.from_numpy(pos), torch.from_numpy(direction),
                torch.from_numpy(var)
            )
        )
    # ours
    out = field.apply(
        params["network_fine"],
        Sampling(jnp.asarray(pos), jnp.asarray(direction), jnp.asarray(var)),
        field.schedule(-1),
    )

    for k, tol in [("distance", 2e-4), ("color", 2e-3), ("aux_grad", 2e-4)]:
        np.testing.assert_allclose(
            np.asarray(out[k]), ref[k].numpy(), rtol=1e-3, atol=tol, err_msg=k
        )
    # density involves 1/D * (1 - |grad|): looser tol near the relu kink
    np.testing.assert_allclose(
        np.asarray(out["density"]), ref["density"].numpy(), rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["fields_penalty"]),
        ref["fields_penalty"].numpy(),
        rtol=5e-3,
        atol=5e-4,
    )


def test_train_schedule_outputs_match_reference(reference_net, jax_setup, rng):
    """Same comparison mid-warmup (iteration 5000) to validate the
    lowpass/aux scale schedules."""
    import torch

    from neddf_tpu.geometry.rays import Sampling

    renderer, params = jax_setup
    field = renderer.network_fine

    reference_net.set_iter(5000)
    pos = (rng.standard_normal((1, 16, 3)) * 0.4).astype(np.float32)
    direction = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (16, 1))[None]
    var = np.zeros((1, 16, 3), np.float32)

    with torch.no_grad():
        from neddf.ray import Sampling as TorchSampling

        ref = reference_net(
            TorchSampling(
                torch.from_numpy(pos), torch.from_numpy(direction),
                torch.from_numpy(var)
            )
        )
    out = field.apply(
        params["network_fine"],
        Sampling(jnp.asarray(pos), jnp.asarray(direction), jnp.asarray(var)),
        field.schedule(5000),
    )
    reference_net.set_iter(-1)

    np.testing.assert_allclose(
        np.asarray(out["distance"]), ref["distance"].numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["density"]), ref["density"].numpy(), rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["color"]), ref["color"].numpy(), rtol=1e-3, atol=2e-3
    )


def test_voxelize_matches_reference(reference_net, jax_setup):
    """BaseNeuralField.voxelize parity on the pretrained checkpoint:
    same meshgrid-'xy' lattice ordering, same chunking, same distance
    volume — the input to the meshing pipeline (reference
    base_neuralfield.py:49-79 feeding fields_visualizer's marching
    cubes + voxel cache)."""
    from neddf_tpu.fields.base import voxelize

    renderer, params = jax_setup
    field = renderer.network_fine

    ref_vol = reference_net.voxelize(
        field_name="distance", cube_range=1.1, cube_resolution=12,
        chunk=500,
    )
    got_vol = voxelize(
        field, params["network_fine"], field_name="distance",
        cube_range=1.1, cube_resolution=12, chunk=500,
    )
    assert got_vol.shape == ref_vol.shape
    np.testing.assert_allclose(got_vol, ref_vol, rtol=1e-3, atol=2e-4)
