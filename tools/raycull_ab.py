"""Whole-ray occupancy-cull A/B on the bundled pretrained artifact.

Loads pretrained/machine_neddf (500x500 machine scene, test split),
renders test views dense and with --ray-cull semantics in the SAME
process, and reports wall time (2nd render, compile excluded) + PSNR
for both. Run on TPU (default backend).
"""
import json
import sys
import time
from pathlib import Path

REPO = Path("/root/repo")
sys.path.insert(0, str(REPO))

import numpy as np

from neddf_tpu import config as config_lib
from neddf_tpu.training.metrics import (
    peak_signal_noise_ratio,
    structural_similarity,
)

PRETRAINED = REPO / "pretrained" / "machine_neddf"


def main() -> None:
    import cv2

    cams = [int(a) for a in sys.argv[1:]] or [0, 12]
    cfg = config_lib.load_snapshot(PRETRAINED)
    cfg["dataset"]["data_split"] = "test"
    cfg["dataset"]["dataset_dir"] = str(REPO / cfg["dataset"]["dataset_dir"])
    cfg["trainer"]["mesh"] = None
    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    trainer.load_pretrained_model(PRETRAINED / "models" / "model_01000.ckpt")

    out = Path("/tmp/raycull_eval")
    result = {}
    for mode in ("dense", "cull"):
        if mode == "cull":
            t0 = time.perf_counter()
            trainer.enable_ray_cull()
            build_s = time.perf_counter() - t0
            result["grid_build_s"] = round(build_s, 3)
        else:
            trainer.eval_ray_cull = None
        times = {}
        psnr = {}
        ssim = {}
        for cam in cams:
            for rep in range(2):  # rep 0 pays the compile
                t0 = time.perf_counter()
                trainer.render_test(out / mode, cam, 1)
                dt = time.perf_counter() - t0
            times[str(cam)] = round(dt, 3)
            rgb = cv2.imread(str(out / mode / f"{cam:03}_rgb.png"))
            gt = cv2.imread(str(out / mode / f"{cam:03}_rgb_gt.png"))
            psnr[str(cam)] = round(float(peak_signal_noise_ratio(rgb, gt)), 3)
            ssim[str(cam)] = round(
                float(structural_similarity(rgb, gt, channel_axis=2)), 4
            )
        result[mode] = {"render_s": times, "psnr": psnr, "ssim": ssim}
    # pixel-level divergence between the two modes (culled-ray approx)
    for cam in cams:
        a = cv2.imread(str(out / "dense" / f"{cam:03}_rgb.png")).astype(float)
        b = cv2.imread(str(out / "cull" / f"{cam:03}_rgb.png")).astype(float)
        result.setdefault("cull_vs_dense_maxabs", {})[str(cam)] = float(
            np.abs(a - b).max()
        )
    print("RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
