"""Export a trained run's checkpoint as a reference-layout ``.pth``.

Usage:
    python -m neddf_tpu.scripts.export_pth <run_dir> [--epoch N]
        [--device cpu]

The inverse of the ``.pth`` importer: loads ``models/model_{N:05}.ckpt``
from a run dir written by this framework and writes
``models/model_{N:05}.pth`` next to it in the PyTorch reference's
``state_dict`` layout (keys/shapes of neddf's NeRFRender module tree,
base_trainer.py:115-121), so the model can be evaluated and visualised
with the reference's own run_eval.py / fields_visualizer.py.
"""
from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path


def main() -> None:
    parser = ArgumentParser()
    parser.add_argument("output_dir", type=Path)
    parser.add_argument("--epoch", type=int, default=None,
                        help="checkpoint epoch (default: newest)")
    parser.add_argument("--device", type=str, default="cpu",
                        help="conversion runs fine on cpu (default)")
    args = parser.parse_args()

    if args.device and args.device.startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from neddf_tpu import config as config_lib
    from neddf_tpu.training.checkpoint import export_torch_state_dict

    output_dir = args.output_dir.resolve()
    cfg = config_lib.load_snapshot(output_dir)
    if args.device:
        cfg["trainer"]["device"] = args.device

    ds_dir = Path(cfg["dataset"]["dataset_dir"])
    if not ds_dir.exists():
        for root in (Path("/root/repo"), Path("/root/reference")):
            if (root / ds_dir).exists():
                cfg["dataset"]["dataset_dir"] = str(root / ds_dir)
                break

    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)

    models = output_dir / "models"
    if args.epoch is not None:
        ckpt = models / f"model_{args.epoch:05}.ckpt"
    else:
        ckpts = sorted(models.glob("model_*.ckpt"))
        if ckpts:
            ckpt = ckpts[-1]
        else:
            # async (orbax) run dirs store step DIRECTORIES, not msgpack
            # files; pick the newest step and synthesize the file name
            # the loader's orbax fallback resolves
            steps = sorted(
                int(p.name) for p in models.iterdir() if p.name.isdigit()
            ) if models.is_dir() else []
            if not steps:
                raise FileNotFoundError(
                    f"no model_*.ckpt files or orbax step dirs under {models}"
                )
            ckpt = models / f"model_{steps[-1]:05}.ckpt"
    if ckpt.exists():
        trainer.load_pretrained_model(ckpt)
    else:
        # orbax step-directory layout (trainer.async_checkpoint=true):
        # load_checkpoint probes models/ for digit dirs and restores the
        # newest full state (params + opt + cameras)
        trainer.load_checkpoint(ckpt)

    out = ckpt.with_suffix(".pth")
    export_torch_state_dict(trainer.params, trainer.neural_render, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
