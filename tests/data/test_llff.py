"""LLFF forward-facing loader (neddf_tpu/data/llff.py).

Round-trips the RAW poses_bounds.npy convention through a synthetic
forward-facing capture of the machine scene, checks the conversion to
our RUB rotvec cameras by reprojection, and runs a short end-to-end
training to prove the full pipeline (BASELINE.json config #5 — absent
in the reference)."""
import numpy as np
import pytest

from neddf_tpu.data import LLFFDataset
from neddf_tpu.data.llff import generate_forward_facing_dataset


@pytest.fixture(scope="module")
def llff_dir(tmp_path_factory):
    return generate_forward_facing_dataset(
        tmp_path_factory.mktemp("llff") / "scene", n_images=9, image_size=64
    )


def test_llff_parses_and_splits(llff_dir):
    train = LLFFDataset(str(llff_dir), "train", factor=1)
    test = LLFFDataset(str(llff_dir), "test", factor=1)
    # hold_every=8 over 9 images -> ids 0 and 8 are test
    assert len(test) == 2 and len(train) == 7
    assert train.rgb_images.shape == (7, 64, 64, 3)
    assert train.camera_params.shape == (7, 6)
    # no masks in forward-facing captures
    assert (train.mask_images == 255).all()
    # bounds were rescaled around target_depth=4
    assert 0 < train.near < 4.0 < train.far


def test_llff_pose_conversion_reprojects(llff_dir):
    """The [down,right,back] -> RUB conversion must reproduce camera
    rays that hit the scene: unproject the centre pixel of each camera
    and check the ray passes near the origin (where the scene sits)."""
    from scipy.spatial.transform import Rotation

    ds = LLFFDataset(str(llff_dir), "train", factor=1)
    for i in range(len(ds)):
        rotvec, t = ds.camera_params[i, :3], ds.camera_params[i, 3:]
        r = Rotation.from_rotvec(rotvec).as_matrix()
        # RUB: camera looks along -z
        forward = -r[:, 2]
        # distance from origin to the centre ray
        closest = t - (t @ forward) * forward * -1.0
        d = np.linalg.norm(np.cross(forward, -t)) / np.linalg.norm(forward)
        del closest
        assert d < 1.0, f"camera {i} centre ray misses the scene (d={d:.2f})"
        # camera positioned at ~ scaled distance 4 (scale is exact here
        # because the generator writes symmetric bounds)
        assert 2.0 < np.linalg.norm(t) < 6.0


def test_llff_end_to_end_training(llff_dir, tmp_path, monkeypatch):
    from neddf_tpu import config as config_lib

    config_dir = (
        __import__("pathlib").Path(__file__).resolve().parents[2] / "config"
    )
    monkeypatch.chdir(tmp_path)
    cfg = config_lib.compose(
        config_dir,
        overrides=[
            "trainer=test",
            "dataset=llff",
            f"dataset.dataset_dir={llff_dir}",
            "dataset.factor=1",
            "loss=nerf_loss",
            "trainer.batch_size=32",
        ],
    )
    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    first = [trainer.run_train_step(i % 3) for i in range(3)]
    later = [trainer.run_train_step(i % 3) for i in range(9)]
    trainer._flush_logs()
    assert np.isfinite(later[-1])
    assert np.mean(later[-3:]) < np.mean(first)


def test_llff_ndc_end_to_end_training(llff_dir, tmp_path, monkeypatch):
    """The full NDC config (recenter + warp + [0,1] window) trains:
    the product path behind `tools/llff_experiment.py --ndc`."""
    from neddf_tpu import config as config_lib

    config_dir = (
        __import__("pathlib").Path(__file__).resolve().parents[2] / "config"
    )
    monkeypatch.chdir(tmp_path)
    cfg = config_lib.compose(
        config_dir,
        overrides=[
            "trainer=test",
            "dataset=llff",
            f"dataset.dataset_dir={llff_dir}",
            "dataset.factor=1",
            "dataset.recenter=true",
            "loss=nerf_loss",
            "trainer.batch_size=32",
            "render.ndc=true",
            "render.ndc_near=2.0",
            "render.sampling_type=point",
        ],
    )
    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    assert trainer.neural_render.ndc
    assert trainer.neural_render.dist_far == 1.0
    first = [trainer.run_train_step(i % 3) for i in range(3)]
    later = [trainer.run_train_step(i % 3) for i in range(9)]
    trainer._flush_logs()
    assert np.isfinite(later[-1])
    assert np.mean(later[-3:]) < np.mean(first)
