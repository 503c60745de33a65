"""Evaluation entry point (twin of neddf/scripts/run_eval.py).

Usage:
    python -m neddf_tpu.scripts.run_eval <output_dir> [--epoch 2000]
        [--cameras 0 25] [--downsampling 1]

Recomposes the config snapshot saved in <output_dir>/.hydra with the
override dataset.data_split=test, loads models/model_{epoch:05}.{ckpt,
pth} (the .pth path accepts checkpoints written by the PyTorch
reference, e.g. /root/reference/pretrained/bunny_smoke), renders every
test camera to <output_dir>/eval and prints per-view PSNR/SSIM.
``--cameras``/``--downsampling`` restrict to selected views / lower
resolution for quick spot checks (the reference always renders all
views full-res; PSNR/SSIM are only computed at downsampling 1).
"""
from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path


def main() -> None:
    parser = ArgumentParser()
    parser.add_argument("output_dir", type=Path)
    parser.add_argument("--epoch", type=int, default=2000)
    parser.add_argument(
        "--device", type=str, default=None, help="override trainer device"
    )
    parser.add_argument(
        "--cameras", type=int, nargs="*", default=None,
        help="test camera ids to render (default: all)",
    )
    parser.add_argument(
        "--downsampling", type=int, default=1,
        help="render at 1/N resolution (PSNR/SSIM only at 1)",
    )
    parser.add_argument(
        "--ray-cull", action="store_true",
        help="skip background rays via an occupancy grid built from the "
        "loaded field (trainer.enable_ray_cull)",
    )
    args = parser.parse_args()

    if args.device and args.device.startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from neddf_tpu import config as config_lib

    output_dir = args.output_dir.resolve()
    cfg = config_lib.load_snapshot(output_dir)
    cfg["dataset"]["data_split"] = "test"
    if args.device:
        cfg["trainer"]["device"] = args.device

    # dataset dirs in reference snapshots are relative to their repo
    ds_dir = Path(cfg["dataset"]["dataset_dir"])
    if not ds_dir.exists():
        for root in (Path("/root/repo"), Path("/root/reference")):
            if (root / ds_dir).exists():
                cfg["dataset"]["dataset_dir"] = str(root / ds_dir)
                break

    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)

    model_dir = output_dir / "models"
    ckpt = model_dir / f"model_{args.epoch:05}.ckpt"
    pth = model_dir / f"model_{args.epoch:05}.pth"
    trainer.load_pretrained_model(ckpt if ckpt.exists() else pth)
    if args.ray_cull:
        trainer.enable_ray_cull()

    save_dir = output_dir / "eval"
    save_dir.mkdir(exist_ok=True)
    if args.cameras is None and args.downsampling == 1:
        trainer.render_all(save_dir)
    else:
        ids = args.cameras if args.cameras is not None else range(
            len(trainer.dataset)
        )
        for camera_id in ids:
            print(f"rendering from camera {camera_id}")
            trainer.render_test(save_dir, camera_id, args.downsampling)


if __name__ == "__main__":
    main()
