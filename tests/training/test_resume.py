"""Mid-training resume: run_train skips completed epochs after
load_checkpoint while keeping the camera-permutation RNG stream aligned
with an uninterrupted run."""
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
            "trainer.epoch_max=3",
        ],
    )
    return config_lib.instantiate(cfg["trainer"], global_config=cfg)


def _stub_hooks(tr, order):
    tr.run_train_step = lambda cid: order.append(cid) or 0.0
    tr.render_field_slices = lambda *a, **k: None
    tr.render_test = lambda *a, **k: None
    tr.save_checkpoint = lambda *a, **k: None
    tr._flush_logs = lambda: 0.0


def test_resume_skips_completed_epochs(trainer, monkeypatch, tmp_path):
    frames = len(trainer.dataset)

    full_order = []
    _stub_hooks(trainer, full_order)
    trainer.iteration = 0
    trainer.run_train()
    assert len(full_order) == 4 * frames  # epochs 0..3

    resumed_order = []
    _stub_hooks(trainer, resumed_order)
    trainer.iteration = 2 * frames  # as if a checkpoint at epoch-2 start
    trainer.run_train()
    assert len(resumed_order) == 2 * frames  # epochs 2..3 only
    # the camera permutations match the uninterrupted run's tail
    assert resumed_order == full_order[2 * frames :]
