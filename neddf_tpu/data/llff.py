"""LLFF forward-facing dataset loader (poses_bounds.npy convention).

The reference has NO LLFF support — BASELINE.json config #5 ("nerf_llff
forward-facing scene") names it, so this parser covers the gap. It reads
the standard LLFF capture layout

    <dir>/poses_bounds.npy   [N, 17] = 3x5 pose-with-hwf + [near, far]
    <dir>/images/            (or images_{factor}/ pre-downsampled)

and converts to this framework's camera convention (BaseDataset:
[fx fy cx cy] intrinsics + [rotvec, translation] RUB camera-to-world
poses, the blender convention the renderer expects).

Conventions handled:
* LLFF pose columns are [down, right, back]; NeRF/blender RUB is
  [right, up, back] — the standard column shuffle [r, -d, b].
* Scene rescale: translations and bounds are scaled so the mid depth
  lands at ``target_depth`` (default 4.0, the bunny_smoke/lego camera
  distance), which puts forward-facing content inside the default
  render window dist_near=2..dist_far=6. The scaled per-scene bounds
  are exposed as ``self.near`` / ``self.far`` for configs that want
  exact values (override render.dist_near/dist_far).
* Split: the LLFF hold-out convention — every ``hold_every``-th image
  is test, the rest train.

No masks exist in forward-facing captures: mask_images is all-255 (so
use_mask configs degenerate gracefully; use the color-only loss group).
"""
from __future__ import annotations

from pathlib import Path
from typing import List

import cv2
import numpy as np
from numpy import ndarray
from scipy.spatial.transform import Rotation

from neddf_tpu.data.base import BaseDataset


class LLFFDataset(BaseDataset):
    def __init__(
        self,
        dataset_dir: str,
        data_split: str,
        use_depth: bool = False,
        use_mask: bool = False,
        factor: int = 4,
        hold_every: int = 8,
        target_depth: float = 4.0,
        recenter: bool = False,
    ) -> None:
        self.factor = int(factor)
        self.hold_every = int(hold_every)
        self.target_depth = float(target_depth)
        # recenter=True rigidly moves the world into the average-camera
        # frame (mean position at the origin, mean view direction along
        # -z) — REQUIRED for render.ndc=true, whose warp assumes a
        # -z-facing capture frame (geometry/camera.py::ndc_rays). A
        # rigid transform, so the non-NDC path's quality is unchanged;
        # kept opt-in so pre-existing run dirs recompose bit-identically.
        self.recenter = bool(recenter)
        self.near: float = 0.0
        self.far: float = 0.0
        super().__init__(dataset_dir, data_split, use_depth, use_mask)

    # ------------------------------------------------------------------
    def _image_paths(self) -> List[Path]:
        for name in (f"images_{self.factor}", "images"):
            d = self.dataset_dir / name
            if d.is_dir():
                paths = sorted(
                    p for p in d.iterdir()
                    if p.suffix.lower() in (".png", ".jpg", ".jpeg")
                )
                if paths:
                    return paths
        raise FileNotFoundError(
            f"no images/ or images_{self.factor}/ under {self.dataset_dir}"
        )

    def load_data(self) -> None:
        arr = np.load(self.dataset_dir / "poses_bounds.npy")  # [N, 17]
        poses = arr[:, :15].reshape(-1, 3, 5)
        bounds = arr[:, 15:17]  # [N, 2] near/far
        n = poses.shape[0]

        paths = self._image_paths()
        if len(paths) != n:
            raise ValueError(
                f"{len(paths)} images vs {n} poses in {self.dataset_dir}"
            )

        img0 = cv2.imread(str(paths[0]), cv2.IMREAD_UNCHANGED)
        h, w = img0.shape[:2]
        # hwf stored at capture resolution; rescale focal to actual size
        cap_h, cap_w, cap_f = poses[0, :, 4]
        focal = float(cap_f) * w / float(cap_w)

        # LLFF [down, right, back] -> RUB [right, up, back]
        r = poses[:, :, 1]
        u = -poses[:, :, 0]
        b = poses[:, :, 2]
        t = poses[:, :, 3]

        if self.recenter:
            # average-camera frame: orthonormal [right, up, back] from
            # the mean back/up columns (right-handed RUB: r = u x b)
            b_avg = b.mean(0) / np.linalg.norm(b.mean(0))
            r_avg = np.cross(u.mean(0), b_avg)
            r_avg = r_avg / np.linalg.norm(r_avg)
            u_avg = np.cross(b_avg, r_avg)
            rot_avg = np.stack([r_avg, u_avg, b_avg], axis=1)  # columns
            center = t.mean(0)
            r = r @ rot_avg
            u = u @ rot_avg
            b = b @ rot_avg
            t = (t - center[None]) @ rot_avg

        # scene rescale: centre the depth window at target_depth
        mid = float(np.mean(bounds))
        scale = self.target_depth / max(mid, 1e-8)
        t = t * scale
        bounds = bounds * scale
        self.near = float(bounds.min())
        self.far = float(bounds.max())

        camera_params = np.zeros((n, 6), np.float32)
        for i in range(n):
            rot = np.stack([r[i], u[i], b[i]], axis=1)  # columns
            # re-orthonormalise against capture noise
            uu, _, vv = np.linalg.svd(rot)
            camera_params[i, :3] = Rotation.from_matrix(uu @ vv).as_rotvec()
            camera_params[i, 3:] = t[i]

        ids = np.arange(n)
        test_mask = (ids % self.hold_every) == 0
        keep = test_mask if self.data_split == "test" else ~test_mask

        def load_image(path: Path) -> ndarray:
            img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
            return img[:, :, :3].astype(np.float32)

        from concurrent.futures import ThreadPoolExecutor

        kept_paths = [p for p, k in zip(paths, keep) if k]
        with ThreadPoolExecutor(max_workers=16) as pool:
            rgb = list(pool.map(load_image, kept_paths))

        self.camera_calib_params = np.array(
            [focal, focal, 0.5 * w, 0.5 * h], np.float64
        )
        self.camera_params = camera_params[keep]
        self.rgb_images = np.stack(rgb, 0)
        self.mask_images = 255 * np.ones(self.rgb_images.shape[:3], np.uint8)


def generate_forward_facing_dataset(
    out_dir: "str | Path",
    n_images: int = 12,
    image_size: int = 128,
    camera_distance: float = 4.0,
    seed: int = 0,
) -> Path:
    """Synthetic LLFF-layout capture of the machine scene.

    Cameras sit on a small grid facing the scene from one side (the
    forward-facing regime), written in the RAW LLFF convention
    (poses_bounds.npy with [down, right, back] columns + hwf, images/
    directory) so LLFFDataset's conversion path is exercised end to end.
    """
    from neddf_tpu.data.synthetic import (
        _look_at,
        _machine_scene,
        _render_machine,
    )

    out_dir = Path(out_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)
    for stale in (out_dir / "images").glob("img_*.png"):
        stale.unlink()  # regeneration with fewer frames must not leak
    rng = np.random.default_rng(seed)
    focal = 1.2 * image_size
    prims, light = _machine_scene()

    rows = []
    for i in range(n_images):
        # viewpoint jitter around a frontal-elevated base position
        off = rng.uniform(-0.6, 0.6, 2)
        eye = np.array(
            [camera_distance * 0.9, off[0], 1.2 + 0.4 * off[1]], np.float64
        )
        c2w = _look_at(eye)
        img = _render_machine(prims, light, c2w, image_size, focal)
        cv2.imwrite(str(out_dir / "images" / f"img_{i:03}.png"), img)

        right, up, back = c2w[:3, 0], c2w[:3, 1], c2w[:3, 2]
        llff_rot = np.stack([-up, right, back], axis=1)  # [down, right, back]
        hwf = np.array([image_size, image_size, focal])
        pose = np.concatenate(
            [llff_rot, c2w[:3, 3:4], hwf[:, None]], axis=1
        )  # [3, 5]
        dist = np.linalg.norm(eye)
        near, far = dist - 1.4, dist + 1.4
        rows.append(np.concatenate([pose.reshape(-1), [near, far]]))

    np.save(out_dir / "poses_bounds.npy", np.stack(rows, 0))
    return out_dir
