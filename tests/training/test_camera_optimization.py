"""Camera pose refinement: optimize_camera updates the sampled camera's
6-DoF delta (the reference structures this via Camera.params nn.Parameter,
camera.py:40, but never optimizes it; here it is a first-class option)."""
import numpy as np
import pytest

from neddf_tpu import config as config_lib

from tests.conftest import REFERENCE_DATA


@pytest.fixture(scope="module")
def trainer():
    cfg = config_lib.compose(
        "config",
        overrides=[
            "trainer=test",
            "dataset=test",
            f"dataset.dataset_dir={REFERENCE_DATA}",
            "trainer.optimize_camera=true",
            "trainer.camera_optimizer_lr=0.001",
        ],
    )
    return config_lib.instantiate(cfg["trainer"], global_config=cfg)


def test_camera_deltas_update_only_for_trained_camera(trainer):
    before = np.asarray(trainer.camera_deltas).copy()
    assert np.all(before == 0.0)
    trainer.run_train_step(0)
    trainer.run_train_step(0)
    after = np.asarray(trainer.camera_deltas)
    # camera 0's delta moved, other cameras' first-moment is zero so they
    # stay put under adam with zero grads
    assert np.abs(after[0]).max() > 0.0
    assert np.abs(after[1:]).max() == pytest.approx(0.0, abs=1e-12)


def test_checkpoint_roundtrip_includes_camera_state(trainer, tmp_path):
    trainer.save_checkpoint(tmp_path / "m.ckpt")
    deltas = np.asarray(trainer.camera_deltas).copy()
    trainer.camera_deltas = trainer.camera_deltas * 0.0
    trainer.load_checkpoint(tmp_path / "m.ckpt")
    np.testing.assert_array_equal(np.asarray(trainer.camera_deltas), deltas)
