"""Field visualizer (twin of neddf/scripts/fields_visualizer.py).

Usage:
    python -m neddf_tpu.scripts.fields_visualizer <output_dir>
        [--epoch 2000] [--resolution 64] [--threshold 0.0275]
        [--slices N] [--gui]

Headless by default (this environment has no display / open3d):
* voxelizes the trained distance field over a ``resolution``^3 lattice,
  caching the volume in ``<output_dir>/mesh/voxel_{res}.npy`` exactly
  like the reference (fields_visualizer.py:532-543),
* extracts the iso-surface at ``threshold`` (reference default 0.0275,
  fields_visualizer.py:39) with the built-in marching-tetrahedra
  isosurfacer, recentres vertices with the reference's mapping
  ``v = (v - res/2) * (2 * cube_range / res)`` (:546-547), and exports
  ``mesh/mesh_{res}_threshold{thr}.dae`` (:563-566) plus an ``.obj``,
* renders 2D field slices (distance/density/color/aux_grad, JET colormap
  for 1-channel fields — render_field_slice parity with
  nerf_render.py:263-336) at ``--slices`` z-planes into
  ``<output_dir>/fields/``.

``--gui`` opens the interactive Open3D viewer when open3d is installed;
otherwise the flag reports that the GUI is unavailable and falls back to
the headless export.
"""
from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def generate_mesh(
    trainer: "object",
    output_dir: Path,
    resolution: int = 64,
    threshold: float = 0.0275,
    cube_range: float = 1.1,
    field_name: str = "distance",
) -> tuple:
    """Voxelize + mesh a scalar field; returns (vertices, triangles).

    ``distance`` for NeDDF (reference default, iso 0.0275), ``sdf`` for
    NeuS (iso 0.0), ``density`` for NeRF (pick a density iso level).
    """
    from neddf_tpu.fields.base import voxelize
    from neddf_tpu.viz import export_dae, export_obj, marching_tetrahedra

    mesh_dir = output_dir / "mesh"
    mesh_dir.mkdir(parents=True, exist_ok=True)
    suffix = "" if field_name == "distance" else f"_{field_name}"
    voxel_path = mesh_dir / f"voxel{suffix}_{resolution}.npy"
    if voxel_path.exists():
        voxel = np.load(voxel_path)
    else:
        voxel = voxelize(
            trainer.neural_render.network_fine,
            trainer.params["network_fine"],
            field_name=field_name,
            cube_range=cube_range,
            cube_resolution=resolution,
        )
        np.save(voxel_path, voxel)

    vertices, triangles = marching_tetrahedra(voxel, threshold)
    vertices -= resolution / 2.0
    vertices *= 2.0 * cube_range / resolution

    dae_path = mesh_dir / f"mesh{suffix}_{resolution}_threshold{threshold}.dae"
    export_dae(dae_path, vertices, triangles, name="mcube")
    export_obj(dae_path.with_suffix(".obj"), vertices, triangles)
    print(
        f"mesh: {vertices.shape[0]} vertices, {triangles.shape[0]} triangles "
        f"-> {dae_path}"
    )
    return vertices, triangles


def export_field_slices(
    trainer: "object", output_dir: Path, n_slices: int
) -> None:
    import cv2

    fields_dir = output_dir / "fields"
    fields_dir.mkdir(parents=True, exist_ok=True)
    for i, slice_t in enumerate(np.linspace(-1.0, 1.0, n_slices)):
        images = trainer.neural_render.render_field_slice(
            trainer.params, slice_t=float(slice_t), render_size=1.1,
            render_resolution=128,
        )
        for name, img in images.items():
            cv2.imwrite(str(fields_dir / f"slice_{name}_z{i:02}.png"), img)
    print(f"field slices ({n_slices} z-planes) -> {fields_dir}")


def _load_trainer(output_dir: Path, epoch: int, device: str | None):
    from neddf_tpu import config as config_lib

    cfg = config_lib.load_snapshot(output_dir)
    if device:
        cfg["trainer"]["device"] = device
    ds_dir = Path(cfg["dataset"]["dataset_dir"])
    if not ds_dir.exists():
        for root in (Path("/root/repo"), Path("/root/reference")):
            if (root / ds_dir).exists():
                cfg["dataset"]["dataset_dir"] = str(root / ds_dir)
                break
    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    model_dir = output_dir / "models"
    ckpt = model_dir / f"model_{epoch:05}.ckpt"
    pth = model_dir / f"model_{epoch:05}.pth"
    trainer.load_pretrained_model(ckpt if ckpt.exists() else pth)
    return trainer


def main() -> None:
    parser = ArgumentParser()
    parser.add_argument("output_dir", type=Path)
    parser.add_argument("--epoch", type=int, default=2000)
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument(
        "--threshold", type=float, default=None,
        help="iso level; default per field: distance 0.0275 (reference "
        "fields_visualizer.py:39), sdf 0.05, density 15.0",
    )
    parser.add_argument(
        "--field", type=str, default="auto",
        help="scalar field to mesh: auto (by network family), "
        "distance (NeDDF), sdf (NeuS), density",
    )
    parser.add_argument("--slices", type=int, default=5)
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--gui", action="store_true")
    args = parser.parse_args()

    if args.device and args.device.startswith("cpu"):
        # pin the platform before any backend initialisation so the tool
        # never waits on (or holds) the exclusive TPU tunnel
        import jax

        jax.config.update("jax_platforms", "cpu")

    output_dir = args.output_dir.resolve()
    trainer = _load_trainer(output_dir, args.epoch, args.device)

    field = args.field
    if field == "auto":
        # pick the family's natural level-set field so the tool works on
        # any run dir out of the box (the reference only handles NeDDF)
        net_kind = type(trainer.neural_render.network_fine).__name__
        field = {"NeDDF": "distance", "NeuS": "sdf"}.get(net_kind, "density")
    threshold = args.threshold
    if threshold is None:
        # NeuS's sdf channel is ReLU-activated (>= 0, reference
        # neus.py takes the first channel of activated features), so the
        # usable level set sits slightly above zero
        threshold = {"distance": 0.0275, "sdf": 0.05}.get(field, 15.0)

    vertices, triangles = generate_mesh(
        trainer, output_dir, args.resolution, threshold, field_name=field,
    )
    export_field_slices(trainer, output_dir, args.slices)

    if args.gui:
        try:
            import open3d  # noqa: F401
        except ImportError:
            print("open3d is not installed; headless artifacts were written instead")
            return
        # full reference-parity GUI (fields_visualizer.py:19-260): live
        # movable slice plane, frusta + dataset images, bounding-box /
        # visible-range toggles, re-meshing panel (viz/gui.py)
        from neddf_tpu.viz.gui import FieldsVisualizerGUI, run_app

        def mesh_fn(resolution, threshold):
            return generate_mesh(
                trainer, output_dir, resolution, threshold, field_name=field
            )

        run_app(lambda: FieldsVisualizerGUI(trainer, mesh_fn))


if __name__ == "__main__":
    main()
