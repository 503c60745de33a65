"""NeRF-synthetic (blender transforms_*.json) dataset parser.

Matches neddf/dataset/nerf_synthetic_dataset.py:25-104 exactly:

* focal = 0.5 * w / tan(0.5 * camera_angle_x); cx, cy = w/2, h/2.
* pose rotvec extracted from the 3x3 block of transform_matrix.
* use_mask path: rgb = (alpha/256) * rgb (premultiplied, still 0..255
  float), mask = raw alpha channel; otherwise mask is all-255.
* images read with cv2.IMREAD_UNCHANGED (BGR order preserved — the
  reference never converts, and writes with cv2 too, so channel order
  round-trips).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import List

import cv2
import numpy as np
from numpy import ndarray
from scipy.spatial.transform import Rotation

from neddf_tpu.data.base import BaseDataset


class NeRFSyntheticDataset(BaseDataset):
    def load_data(self) -> None:
        transform_path: Path = self.dataset_dir / f"transforms_{self.data_split}.json"
        with open(transform_path) as f:
            transform_data = json.load(f)

        frames = transform_data["frames"]
        img0 = cv2.imread(
            str(self.dataset_dir / (frames[0]["file_path"] + ".png")),
            cv2.IMREAD_UNCHANGED,
        )
        h, w = img0.shape[:2]
        camera_angle_x = float(transform_data["camera_angle_x"])
        focal = 0.5 * w / np.tan(0.5 * camera_angle_x)

        camera_params: List[ndarray] = []
        for frame in frames:
            transform_matrix = np.array(frame["transform_matrix"])
            camera_param = np.zeros(6, np.float32)
            camera_param[:3] = Rotation.from_matrix(
                transform_matrix[:3, :3]
            ).as_rotvec()
            camera_param[3:] = transform_matrix[:3, 3]
            camera_params.append(camera_param)

        # threaded decode: cv2.imread releases the GIL, so a pool cuts the
        # 100-frame load from tens of seconds to a few
        def load_frame(frame):
            img_path = self.dataset_dir / (frame["file_path"] + ".png")
            img = cv2.imread(str(img_path), cv2.IMREAD_UNCHANGED)
            if self.use_mask:
                rgb = (
                    (1.0 / 256)
                    * img[:, :, 3, None].astype(np.float32)
                    * img[:, :, :3].astype(np.float32)
                )
                return rgb, img[:, :, 3]
            return img[:, :, :3].astype(np.float32), 255 * np.ones_like(img[:, :, 0])

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as pool:
            loaded = list(pool.map(load_frame, frames))
        rgb_images = [rgb for rgb, _ in loaded]
        mask_images = [mask for _, mask in loaded]

        self.camera_calib_params = np.array([focal, focal, 0.5 * w, 0.5 * h])
        self.camera_params = np.stack(camera_params, 0)
        self.rgb_images = np.stack(rgb_images, 0)
        self.mask_images = np.stack(mask_images, 0)
