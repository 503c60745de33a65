"""End-to-end CLI smoke tests: the four entry points the reference ships
(run.py, run_eval.py, fields_visualizer.py, dataset_visualizer.py —
reference neddf/scripts/) driven in-process on the tiny test config.

Covers the full user workflow on one run dir: train -> snapshot ->
eval render -> meshing/slices -> dataset inspection.
"""
import sys
from pathlib import Path

import pytest

from tests.conftest import REFERENCE_DATA as DATA_DIR

TINY = [
    "dataset=test",
    "trainer=test",
    f"dataset.dataset_dir={DATA_DIR}",
    "network.embed_pos_rank=4",
    "network.embed_dir_rank=2",
    "network.ddf_layer_count=4",
    "network.ddf_layer_width=16",
    "network.col_layer_count=3",
    "network.col_layer_width=16",
    "network.skips=[1]",
    "render.sample_coarse=8",
    "render.sample_fine=8",
    "trainer.batch_size=16",
    "trainer.chunk=64",
    "trainer.epoch_save_model=1",
    "trainer.epoch_save_fields=1",
]


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """One trained tiny run dir shared by the downstream CLI tests."""
    from neddf_tpu.scripts import run

    d = tmp_path_factory.mktemp("cli_run")
    cwd = Path.cwd()
    try:
        run.main(TINY + [f"hydra.run.dir={d}"])
    finally:
        import os

        os.chdir(cwd)
    return d


def test_run_cli_writes_snapshot_and_checkpoint(run_dir):
    assert (run_dir / ".hydra" / "config.yaml").exists()
    assert (run_dir / ".hydra" / "overrides.yaml").exists()
    # epoch_save_model=1, epoch_max=1 -> initial + epoch-1 checkpoints
    ckpts = sorted((run_dir / "models").glob("model_*.ckpt"))
    assert ckpts, "no checkpoint written"
    # field slices from the epoch hook
    assert list((run_dir / "render" / "fields").glob("field_*.png"))


def test_run_eval_cli(run_dir, monkeypatch):
    from neddf_tpu.scripts import run_eval

    epoch = max(
        int(p.stem.split("_")[1]) for p in (run_dir / "models").glob("model_*.ckpt")
    )
    monkeypatch.setattr(
        sys, "argv",
        [
            "run_eval", str(run_dir), "--epoch", str(epoch), "--device", "cpu",
            "--cameras", "0", "--downsampling", "8",
        ],
    )
    run_eval.main()
    evals = list((run_dir / "eval").glob("*_rgb.png"))
    assert evals, "run_eval wrote no renders"


def test_fields_visualizer_cli(run_dir, monkeypatch):
    from neddf_tpu.scripts import fields_visualizer

    epoch = max(
        int(p.stem.split("_")[1]) for p in (run_dir / "models").glob("model_*.ckpt")
    )
    monkeypatch.setattr(
        sys, "argv",
        [
            "fields_visualizer", str(run_dir), "--epoch", str(epoch),
            "--resolution", "16", "--slices", "1", "--device", "cpu",
        ],
    )
    fields_visualizer.main()
    assert list((run_dir / "mesh").glob("voxel_*.npy")), "no voxel cache"
    assert list((run_dir / "fields").glob("*.png")), "no slice images"


def test_dataset_visualizer_cli(run_dir, monkeypatch, tmp_path):
    import os

    from neddf_tpu.scripts import dataset_visualizer

    monkeypatch.setattr(
        sys, "argv",
        ["dataset_visualizer", "dataset=test", f"dataset.dataset_dir={DATA_DIR}"],
    )
    cwd = Path.cwd()
    os.chdir(tmp_path)
    try:
        dataset_visualizer.main()
    finally:
        os.chdir(cwd)
    out = tmp_path / "dataset_viz"
    assert out.exists() and any(out.iterdir()), "dataset_visualizer wrote nothing"


def test_export_pth_cli(run_dir, monkeypatch):
    from neddf_tpu.scripts import export_pth

    monkeypatch.setattr(
        sys, "argv", ["export_pth", str(run_dir), "--device", "cpu"]
    )
    export_pth.main()
    pths = list((run_dir / "models").glob("model_*.pth"))
    assert pths, "export_pth wrote no .pth"
