"""``.pth`` export: the inverse of the reference-checkpoint importer.

Round-trips export -> import for every field family, checks key/shape
equality against the reference's shipped checkpoint, and — the
definitive compatibility proof — strict-``load_state_dict``s an exported
file into the reference's own torch module tree.
"""
import os
import sys

import jax
import numpy as np
import pytest

from neddf_tpu.render import NeRFRender
from neddf_tpu.training.checkpoint import (
    export_torch_state_dict,
    import_torch_state_dict,
)

PTH = "/root/reference/pretrained/bunny_smoke/models/model_02000.pth"

NEDDF_CFG = {
    "_target_": "neddf_tpu.fields.NeDDF",
    "embed_pos_rank": 10, "embed_dir_rank": 4,
    "ddf_layer_count": 8, "ddf_layer_width": 256,
    "col_layer_count": 4, "col_layer_width": 256,
    "d_near": 0.001,
}
NERF_CFG = {
    "_target_": "neddf_tpu.fields.NeRF",
    "embed_pos_rank": 10, "embed_dir_rank": 4,
    "layer_count": 8, "layer_width": 64, "skips": [4],
}
NEUS_CFG = {
    "_target_": "neddf_tpu.fields.NeuS",
    "embed_pos_rank": 6, "embed_dir_rank": 4,
    "sdf_layer_count": 4, "sdf_layer_width": 64,
    "col_layer_count": 4, "col_layer_width": 64, "skips": [2],
}


def _renderer(net_cfg, use_coarse):
    return NeRFRender(
        network_config=net_cfg, sample_coarse=8, sample_fine=8,
        use_coarse_network=use_coarse,
    )


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize(
    "net_cfg,use_coarse",
    [(NEDDF_CFG, False), (NERF_CFG, True), (NEUS_CFG, False)],
    ids=["neddf", "nerf-coarse", "neus"],
)
def test_export_import_roundtrip(tmp_path, net_cfg, use_coarse):
    renderer = _renderer(net_cfg, use_coarse)
    params = renderer.init(jax.random.PRNGKey(0))
    out = tmp_path / "model_00001.pth"
    export_torch_state_dict(params, renderer, out)
    back = import_torch_state_dict(out, renderer)
    _assert_trees_equal(params, back)


@pytest.mark.skipif(not os.path.exists(PTH), reason="reference ckpt absent")
def test_export_matches_reference_key_layout(tmp_path):
    """Exported NeDDF file has exactly the shipped checkpoint's keys and
    shapes (incl. the duplicated network_coarse tree the reference's
    shared-network module layout produces, nerf_render.py:75)."""
    import torch

    renderer = _renderer(NEDDF_CFG, use_coarse=False)
    params = renderer.init(jax.random.PRNGKey(0))
    out = tmp_path / "model_00002.pth"
    export_torch_state_dict(params, renderer, out)

    ours = torch.load(str(out), map_location="cpu")
    ref = torch.load(PTH, map_location="cpu")
    assert set(ours.keys()) == set(ref.keys())
    for k in ref:
        assert tuple(ours[k].shape) == tuple(ref[k].shape), k


@pytest.mark.skipif(not os.path.exists(PTH), reason="reference ckpt absent")
def test_reference_module_strict_load(tmp_path):
    """The reference's own torch NeDDF strict-loads an exported tree."""
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from neddf.network import NeDDF as TorchNeDDF

    renderer = _renderer(NEDDF_CFG, use_coarse=False)
    params = renderer.init(jax.random.PRNGKey(1))
    out = tmp_path / "model_00003.pth"
    export_torch_state_dict(params, renderer, out)
    sd = torch.load(str(out), map_location="cpu")

    net = TorchNeDDF(
        embed_pos_rank=10, embed_dir_rank=4,
        ddf_layer_count=8, ddf_layer_width=256,
        col_layer_count=4, col_layer_width=256, d_near=0.001,
    )
    net.load_state_dict(
        {
            k[len("network_fine."):]: v
            for k, v in sd.items()
            if k.startswith("network_fine.")
        }
    )  # strict=True default: raises on any missing/unexpected/mis-shaped key
