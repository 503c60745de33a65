"""Hermetic trainer smoke tests on the bundled bunny_smoke data
(reference pattern: tests/trainer/test_nerf_trainer.py with
config/trainer/test.yaml). Uses a tiny network + few samples so the CPU
jit stays fast."""
from pathlib import Path

import numpy as np
import pytest

from neddf_tpu import config as config_lib

from tests.conftest import REFERENCE_DATA as DATA_DIR


def tiny_config():
    cfg = config_lib.compose(
        Path(__file__).resolve().parents[2] / "config",
        overrides=["dataset=test", "trainer=test"],
    )
    cfg["dataset"]["dataset_dir"] = DATA_DIR
    cfg["network"].update(
        {
            "embed_pos_rank": 4,
            "embed_dir_rank": 2,
            "ddf_layer_count": 4,
            "ddf_layer_width": 16,
            "col_layer_count": 3,
            "col_layer_width": 16,
            "skips": [1],
        }
    )
    cfg["render"].update({"sample_coarse": 8, "sample_fine": 8})
    cfg["trainer"].update({"batch_size": 16, "chunk": 64})
    return cfg


@pytest.fixture(scope="module")
def trainer():
    cfg = tiny_config()
    return config_lib.instantiate(cfg["trainer"], global_config=cfg)


def test_dataset_contract(trainer):
    ds = trainer.dataset
    assert len(ds) == 100
    item = ds[0]
    assert item["camera_calib_params"].shape == (4,)
    assert item["camera_params"].shape == (6,)
    assert item["rgb_images"].shape == (500, 500, 3)
    assert item["mask_images"].shape == (500, 500)
    # premultiplied alpha keeps rgb in 0..255 float
    assert item["rgb_images"].dtype == np.float32
    assert 0 <= item["rgb_images"].min() and item["rgb_images"].max() <= 255.0


def test_train_step_reduces_loss_and_is_finite(trainer):
    losses = [trainer.run_train_step(0) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)
    # warmup schedules advanced
    assert trainer.iteration == 3


def test_checkpoint_roundtrip(tmp_path, trainer):
    import jax

    path = tmp_path / "model_00000.ckpt"
    trainer.save_checkpoint(path)
    before = jax.device_get(trainer.params)
    trainer.run_train_step(1)
    trainer.load_checkpoint(path)
    after = jax.device_get(trainer.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_render_test_writes_images(tmp_path, trainer):
    trainer.render_test(tmp_path, 0, downsampling=25)  # 20x20 render
    assert (tmp_path / "000_rgb.png").exists()
    assert (tmp_path / "000_depth.png").exists()
    assert (tmp_path / "000_rgb_gt.png").exists()


def test_metrics_match_expected_values(rng):
    from neddf_tpu.training.metrics import (
        peak_signal_noise_ratio,
        structural_similarity,
    )

    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    assert peak_signal_noise_ratio(img, img) == float("inf")
    assert structural_similarity(img, img, channel_axis=2) == pytest.approx(1.0)

    noisy = np.clip(img.astype(int) + rng.integers(-20, 20, img.shape), 0, 255).astype(
        np.uint8
    )
    psnr = peak_signal_noise_ratio(img, noisy)
    assert 20 < psnr < 30
    ssim = structural_similarity(img, noisy, channel_axis=2)
    assert 0.3 < ssim < 0.99
