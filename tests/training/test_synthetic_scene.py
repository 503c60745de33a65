"""Hermetic end-to-end training on a generated scene (no bundled data).

Generates an analytic lambertian-sphere dataset, trains a tiny NeDDF
for a few steps, and checks the loss decreases — the full pipeline
(dataset parse -> cameras -> renderer -> field -> losses -> Adam)
without any dependency on the reference repository's assets."""
import numpy as np
import pytest

from neddf_tpu import config as config_lib
from neddf_tpu.data.synthetic import generate_sphere_dataset


@pytest.fixture(scope="module")
def sphere_dir(tmp_path_factory):
    return generate_sphere_dataset(
        tmp_path_factory.mktemp("sphere"), n_train=4, n_test=1, image_size=48
    )


def test_dataset_parses(sphere_dir):
    from neddf_tpu.data import NeRFSyntheticDataset

    ds = NeRFSyntheticDataset(
        dataset_dir=str(sphere_dir), data_split="train", use_depth=False,
        use_mask=True,
    )
    assert len(ds) == 4
    assert ds.rgb_images.shape == (4, 48, 48, 3)
    # the sphere covers part of the frame: mask has both classes
    assert 0 < (ds.mask_images > 0).mean() < 1


def test_end_to_end_training_improves(sphere_dir, tmp_path, monkeypatch):
    config_dir = __import__("pathlib").Path(__file__).resolve().parents[2] / "config"
    monkeypatch.chdir(tmp_path)  # logger writes ./log
    cfg = config_lib.compose(
        config_dir,
        overrides=[
            "trainer=test",
            "dataset=test",
            f"dataset.dataset_dir={sphere_dir}",
            "trainer.batch_size=64",
        ],
    )
    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    first = [trainer.run_train_step(i % 4) for i in range(3)]
    later = [trainer.run_train_step(i % 4) for i in range(12)]
    assert np.isfinite(later[-1])
    assert np.mean(later[-3:]) < np.mean(first)


def test_test_split_renders(sphere_dir, tmp_path):
    from neddf_tpu.data import NeRFSyntheticDataset

    ds = NeRFSyntheticDataset(
        dataset_dir=str(sphere_dir), data_split="test", use_depth=False,
        use_mask=True,
    )
    assert len(ds) == 1


def test_machine_scene_generates_and_parses(tmp_path):
    """The nerf_synthetic validation proxy: multi-object, textured,
    shadowed, lego-convention cameras (data/synthetic.py)."""
    from neddf_tpu.data import NeRFSyntheticDataset
    from neddf_tpu.data.synthetic import generate_machine_dataset

    d = generate_machine_dataset(
        tmp_path / "machine", n_train=3, n_test=1, image_size=96
    )
    ds = NeRFSyntheticDataset(
        dataset_dir=str(d), data_split="train", use_depth=False, use_mask=True
    )
    assert len(ds) == 3
    assert ds.rgb_images.shape == (3, 96, 96, 3)
    cover = (ds.mask_images > 0).mean()
    # the machine + plate fill a substantial but partial view
    assert 0.05 < cover < 0.9
    # textured multi-object content: many distinct colors on the object
    hits = ds.rgb_images[ds.mask_images > 0]
    assert np.unique((hits // 32).astype(np.int32), axis=0).shape[0] > 20
    # lego camera intrinsics convention
    import json

    meta = json.load(open(d / "transforms_train.json"))
    assert abs(meta["camera_angle_x"] - 0.6911112) < 1e-6


def test_drums_scene_generates(tmp_path):
    """The thin-structure drums proxy scene (BASELINE configs #3/#4's
    drums half) parses through the standard loader, with sub-pixel
    stands present: foreground alpha in a mid band, both mask classes."""
    from neddf_tpu.data import NeRFSyntheticDataset
    from neddf_tpu.data.synthetic import generate_drums_dataset

    out = generate_drums_dataset(
        tmp_path / "drums", n_train=3, n_test=1, image_size=64
    )
    ds = NeRFSyntheticDataset(
        dataset_dir=str(out), data_split="train", use_depth=False,
        use_mask=True,
    )
    assert len(ds) == 3
    assert ds.rgb_images.shape == (3, 64, 64, 3)
    cov = (ds.mask_images > 0).mean()
    assert 0.1 < cov < 0.9
