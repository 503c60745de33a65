"""Dataset-loader parity against the PyTorch reference on the bundled
bunny_smoke scene: intrinsics (focal from camera_angle_x), rotvec pose
conversion, cv2 BGR round-trip, premultiplied alpha and the mask
channel must all produce the SAME arrays (reference:
neddf/dataset/nerf_synthetic_dataset.py:25-104).
"""
import os
import sys

import numpy as np
import pytest

from neddf_tpu.data import NeRFSyntheticDataset

REF = "/root/reference"
DATA = os.path.join(REF, "data", "bunny_smoke")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="bundled bunny_smoke not mounted"
)


@pytest.mark.parametrize("split", ["train", "test"])
def test_dataset_arrays_match_reference(split):
    pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from neddf.dataset import NeRFSyntheticDataset as TorchDataset

    ref = TorchDataset(dataset_dir=DATA, data_split=split, use_mask=True)
    ours = NeRFSyntheticDataset(
        dataset_dir=DATA, data_split=split, use_mask=True
    )

    np.testing.assert_allclose(
        ours.camera_calib_params, ref.camera_calib_params, rtol=1e-6
    )
    np.testing.assert_allclose(
        ours.camera_params, ref.camera_params, rtol=1e-5, atol=1e-6
    )
    assert ours.rgb_images.shape == ref.rgb_images.shape
    # identical premultiplied-alpha uint8 pixels, every frame
    np.testing.assert_array_equal(ours.rgb_images, ref.rgb_images)
    np.testing.assert_array_equal(ours.mask_images, ref.mask_images)
