"""Measure the torch reference's train-step rays/s on this host's CPU.

Runs the reference's REAL hot loop (Camera.create_rays -> NeRFRender.
render_rays with the default neddf config -> losses -> backward -> Adam)
with a tiny hydra stub (hydra is absent here; instantiate is a 6-line
_target_ resolver). Shapes match the flagship config: batch 512 rays,
64 coarse + 128 fine samples, cone sampling, no separate coarse net.
"""
import json
import sys
import time
import types

import numpy as np

# ---- minimal hydra/omegaconf stub (reference imports them at module level)
omegaconf = types.ModuleType("omegaconf")


class DictConfig(dict):
    pass


omegaconf.DictConfig = DictConfig
sys.modules["omegaconf"] = omegaconf

hydra = types.ModuleType("hydra")
hydra_utils = types.ModuleType("hydra.utils")


def _instantiate(cfg, **kwargs):
    cfg = dict(cfg)
    target = cfg.pop("_target_")
    mod, name = target.rsplit(".", 1)
    __import__(mod)
    cls = getattr(sys.modules[mod], name)
    cfg.update(kwargs)
    return cls(**cfg)


hydra_utils.instantiate = _instantiate
hydra.utils = hydra_utils
sys.modules["hydra"] = hydra
sys.modules["hydra.utils"] = hydra_utils

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from neddf.camera import Camera, PinholeCalib  # noqa: E402
from neddf.loss import ColorLoss, FieldsConstraintLoss, MaskBCELoss  # noqa: E402
from neddf.render import NeRFRender  # noqa: E402

torch.manual_seed(3408)
np.random.seed(3408)

NETWORK = DictConfig(
    dict(
        _target_="neddf.network.NeDDF",
        embed_pos_rank=10,
        embed_dir_rank=4,
        ddf_layer_count=8,
        ddf_layer_width=256,
        col_layer_count=4,
        col_layer_width=256,
        d_near=0.001,
        activation_type="tanhExp",
        density_activation_type="ReLU",
        lowpass_alpha_offset=10,
        penalty_weight=DictConfig(
            dict(
                constraints_aux_grad=0.05,
                constraints_dDdt=1.0,
                constraints_color=0.0001,
                range_distance=1.0,
                range_aux_grad=1.0,
                range_color=0.1,
            )
        ),
        skips=[4],
    )
)

render = NeRFRender(
    network_config=NETWORK,
    sample_coarse=64,
    sample_fine=128,
    dist_near=2.0,
    dist_far=6.0,
    max_dist=6.0,
    use_coarse_network=False,
    sampling_type="cone",
)

# bunny_smoke frame-0 camera
meta = json.load(open("/root/reference/data/bunny_smoke/transforms_train.json"))
h = w = 500
focal = 0.5 * w / np.tan(0.5 * meta["camera_angle_x"])
calib = PinholeCalib(np.array([focal, focal, w / 2, h / 2], np.float32))
m = np.array(meta["frames"][0]["transform_matrix"], np.float32)
from scipy.spatial.transform import Rotation  # noqa: E402

rotvec = Rotation.from_matrix(m[:3, :3]).as_rotvec()
camera_param = np.concatenate([rotvec, m[:3, 3]]).astype(np.float32)
camera = Camera(calib, camera_param)
camera.update_transform()

losses = [
    ColorLoss(1.0, 0.1),
    MaskBCELoss(0.05, 0.005),
    FieldsConstraintLoss(0.01, 0.01),
]

params = render.get_parameters_list()
optimizer = torch.optim.Adam(params, lr=5e-4)

BATCH = 512
rgb_t = torch.rand(BATCH, 3)
mask_t = torch.rand(BATCH)
target = {
    "color": rgb_t,
    "mask": mask_t,
    "fields_penalty": torch.zeros(BATCH),
}


def step():
    camera.update_transform()  # per-step, as in nerf_trainer.run_train_step
    us = torch.randint(0, w, (BATCH, 1), dtype=torch.int16)
    vs = torch.randint(0, h, (BATCH, 1), dtype=torch.int16)
    uv = torch.cat([us, vs], 1)
    optimizer.zero_grad()
    render_result = render.render_rays(uv, camera)
    loss_dict = {}
    for f in losses:
        loss_dict.update(f(render_result, target))
    loss = sum(loss_dict.values())
    loss.backward()
    optimizer.step()
    render.next_iter()
    return float(loss.detach())


warmup = int(sys.argv[1]) if len(sys.argv) > 1 else 2
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
for _ in range(warmup):
    step()
t0 = time.time()
for _ in range(iters):
    loss = step()
dt = (time.time() - t0) / iters
print(
    json.dumps(
        {
            "impl": "reference-torch-cpu",
            "batch": BATCH,
            "sec_per_step": dt,
            "rays_per_sec": BATCH / dt,
            "loss": loss,
            "torch_threads": torch.get_num_threads(),
        }
    )
)
