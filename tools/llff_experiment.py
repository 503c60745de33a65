"""Hold-out quality for the LLFF forward-facing config (round-2 #6).

BASELINE.json config #5 is the forward-facing pipeline; round 2 drove
it end-to-end but recorded no quality number. This experiment trains on
a synthetic forward-facing capture (neddf_tpu/data/llff.py writes the
RAW poses_bounds.npy convention, so the whole conversion path is
exercised) and reports held-out PSNR/SSIM like every other BASELINE
config.

Usage (TPU, ~15 min at the defaults):

    python tools/llff_experiment.py [--epochs 600] [--images 24]
        [--size 400] [--family neddf|nerf]

Trains under outputs/llff_quality_<family>/ and finishes with one
RESULT json line: per-held-out-view PSNR/SSIM at full resolution
(hold_every=8 -> image ids 0,8,16 are the test split).
"""
from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--family", choices=["neddf", "nerf"], default="neddf")
    ap.add_argument("--device", type=str, default=None)
    ap.add_argument(
        "--ndc", action="store_true",
        help="NDC ray parameterization (render.ndc=true + "
        "dataset.recenter=true); near plane at 0.9x the scaled near bound",
    )
    args = ap.parse_args()

    if args.device and args.device.startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from neddf_tpu import config as config_lib
    from neddf_tpu.data.llff import generate_forward_facing_dataset

    scene = generate_forward_facing_dataset(
        REPO / "outputs" / "llff_scene", n_images=args.images,
        image_size=args.size,
    )

    overrides = [
        "dataset=llff",
        f"dataset.dataset_dir={scene}",
        "dataset.factor=1",
        "loss=nerf_loss",  # forward-facing captures carry no masks
        f"trainer.epoch_max={args.epochs}",
        f"trainer.epoch_save_model={max(args.epochs // 2, 1)}",
        f"trainer.epoch_test_rendering={max(args.epochs // 3, 1)}",
        "trainer.epoch_save_fields=100000",
    ]
    if args.family == "nerf":
        overrides += ["network=nerf", "render=nerf_render"]
    if args.ndc:
        import numpy as np

        # near plane from the capture's scaled bounds (llff.py scales so
        # the mid depth lands at target_depth=4.0)
        bounds = np.load(scene / "poses_bounds.npy")[:, 15:17]
        scale = 4.0 / float(np.mean(bounds))
        ndc_near = 0.9 * float(bounds.min()) * scale
        overrides += [
            "dataset.recenter=true",
            "render.ndc=true",
            f"render.ndc_near={ndc_near:.6f}",
            "render.sampling_type=point",
        ]
    if args.device:
        overrides.append(f"trainer.device={args.device}")
    cfg = config_lib.compose(REPO / "config", overrides=overrides)

    suffix = "_ndc" if args.ndc else ""
    run_dir = REPO / "outputs" / f"llff_quality_{args.family}{suffix}"
    run_dir.mkdir(parents=True, exist_ok=True)
    config_lib.save_snapshot(cfg, overrides, run_dir)
    os.chdir(run_dir)

    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    # depth window from the dataset's scaled bounds (llff.yaml note)
    print(f"[llff] near={trainer.dataset.near:.3f} "
          f"far={trainer.dataset.far:.3f} "
          f"render window=[{trainer.neural_render.dist_near}, "
          f"{trainer.neural_render.dist_far}]")
    trainer.run_train()

    # held-out eval at full resolution
    cfg_eval = config_lib.compose(REPO / "config", overrides=overrides)
    cfg_eval["dataset"] = dict(cfg["dataset"], data_split="test")
    cfg_eval["network"] = cfg["network"]
    cfg_eval["render"] = cfg["render"]
    cfg_eval["trainer"] = dict(cfg["trainer"])
    ev = config_lib.instantiate(cfg_eval["trainer"], global_config=cfg_eval)
    ev.params = jax.device_put(jax.device_get(trainer.params), ev.device)
    eval_dir = run_dir / "eval"
    results = {}
    import cv2

    from neddf_tpu.training.metrics import (
        peak_signal_noise_ratio,
        structural_similarity,
    )

    for cam in range(len(ev.dataset)):
        ev.render_test(eval_dir, cam, 1)
        rgb = cv2.imread(str(eval_dir / f"{cam:03}_rgb.png"))
        gt = cv2.imread(str(eval_dir / f"{cam:03}_rgb_gt.png"))
        results[str(cam)] = {
            "psnr": float(peak_signal_noise_ratio(rgb, gt)),
            "ssim": float(structural_similarity(rgb, gt, channel_axis=2)),
        }
    result = {"family": args.family, "epochs": args.epochs,
              "images": args.images, "size": args.size,
              "ndc": bool(args.ndc), "views": results}
    print("RESULT " + json.dumps(result))
    (run_dir / "result.json").write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
