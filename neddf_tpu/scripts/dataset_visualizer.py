"""Dataset visualizer (twin of neddf/scripts/dataset_visualizer.py).

Usage:
    python -m neddf_tpu.scripts.dataset_visualizer [overrides...] [--gui]

Headless by default: loads the dataset through the config system (same
override surface as training, e.g. ``dataset=bunny_smoke``
``dataset.dataset_dir=data/bunny_smoke``) and exports
``dataset_viz/cameras.obj`` — a wireframe scene containing one camera
frustum pyramid per frame plus the visible-range box the reference draws
in its Open3D GUI (dataset_visualizer.py:22-30: visible range
[4.0, 6.0]) — and a ``dataset_viz/summary.txt`` with pose/intrinsics
statistics. ``--gui`` opens Open3D when available.
"""
from __future__ import annotations

import sys
from pathlib import Path
from typing import List, Tuple

import numpy as np


def camera_frustum_lines(
    rotvec: np.ndarray,
    translation: np.ndarray,
    calib: np.ndarray,
    width: int,
    height: int,
    depth: float = 0.3,
) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Five-point camera pyramid (apex + 4 image-plane corners) in world
    space, matching the RUB camera convention of the geometry layer."""
    from scipy.spatial.transform import Rotation

    fx, fy, cx, cy = calib[:4]
    corners_px = np.array(
        [[0, 0], [width, 0], [width, height], [0, height]], dtype=np.float64
    )
    # unproject (RDF pixel frame -> RUB camera frame, pinhole_calib.py:51-74)
    x = (corners_px[:, 0] - cx) / fx
    y = -(corners_px[:, 1] - cy) / fy
    z = -np.ones(4)
    corners = np.stack([x, y, z], axis=1) * depth
    pts_local = np.concatenate([np.zeros((1, 3)), corners], axis=0)
    rot = Rotation.from_rotvec(rotvec).as_matrix()
    pts = pts_local @ rot.T + translation[None, :]
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return pts, edges


def export_wireframe_obj(
    path: Path, points: np.ndarray, lines: List[Tuple[int, int]]
) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for p in points:
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for a, b in lines:
            f.write(f"l {a + 1} {b + 1}\n")


def main() -> None:
    argv = sys.argv[1:]
    gui = "--gui" in argv
    overrides = [a for a in argv if a != "--gui"]

    from neddf_tpu import config as config_lib

    # resolve the repo config dir like run.py — the tool then works from
    # any cwd (the reference requires running from the repo root)
    repo_root = Path(__file__).resolve().parents[2]
    cfg = config_lib.compose(repo_root / "config", overrides=overrides)
    dataset = config_lib.instantiate(cfg["dataset"])

    out_dir = Path("dataset_viz")
    out_dir.mkdir(parents=True, exist_ok=True)

    calib = dataset.camera_calib_params
    poses = dataset.camera_params
    w, h = dataset.image_width, dataset.image_height

    all_pts: List[np.ndarray] = []
    all_lines: List[Tuple[int, int]] = []
    for i in range(len(dataset)):
        pts, edges = camera_frustum_lines(poses[i, :3], poses[i, 3:6], calib, w, h)
        base = len(all_pts) * 5
        all_pts.append(pts)
        all_lines.extend((base + a, base + b) for a, b in edges)

    # visible-range box ([-1.1, 1.1]^3 scene bounds the reference draws)
    r = 1.1
    base = len(all_pts) * 5
    box = np.array(
        [[sx * r, sy * r, sz * r] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    all_pts.append(box)
    box_edges = [
        (0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    all_lines.extend((base + a, base + b) for a, b in box_edges)

    points = np.concatenate(all_pts, axis=0)
    export_wireframe_obj(out_dir / "cameras.obj", points, all_lines)

    center = poses[:, 3:6].mean(axis=0)
    radius = np.linalg.norm(poses[:, 3:6] - center[None], axis=1)
    summary = "\n".join(
        [
            f"frames: {len(dataset)}",
            f"image size: {w} x {h}",
            f"calib fx,fy,cx,cy: {np.round(calib[:4], 3).tolist()}",
            f"camera center mean: {np.round(center, 4).tolist()}",
            f"camera radius min/mean/max: "
            f"{radius.min():.4f} / {radius.mean():.4f} / {radius.max():.4f}",
        ]
    )
    (out_dir / "summary.txt").write_text(summary + "\n")
    print(summary)
    print(f"wireframe -> {out_dir / 'cameras.obj'}")

    if gui:
        try:
            import open3d  # noqa: F401
        except ImportError:
            print("open3d is not installed; headless artifacts were written instead")
            return
        # full reference-parity GUI: pyramids + textured image planes +
        # visible-range toggles (viz/gui.py)
        from neddf_tpu.viz.gui import DatasetVisualizerGUI, run_app

        run_app(lambda: DatasetVisualizerGUI(dataset))


if __name__ == "__main__":
    main()
