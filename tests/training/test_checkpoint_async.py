"""AsyncCheckpointer: orbax-backed save/restore round-trip + resume."""
import jax.numpy as jnp
import numpy as np

from neddf_tpu.training.checkpoint import AsyncCheckpointer
from tests.conftest import REFERENCE_DATA


def _state():
    return {
        "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros(4)},
        "iteration": 42,
    }


def test_roundtrip(tmp_path):
    ckpt = AsyncCheckpointer(tmp_path / "models")
    state = _state()
    ckpt.save(100, state)
    ckpt.wait()
    assert ckpt.latest_step() == 100
    restored = ckpt.restore(100, _state())
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["iteration"]) == 42


def test_multiple_steps_latest(tmp_path):
    ckpt = AsyncCheckpointer(tmp_path / "models")
    for step in (100, 200, 300):
        ckpt.save(step, _state())
    ckpt.wait()
    assert ckpt.latest_step() == 300


def test_trainer_async_checkpoint_roundtrip(tmp_path, monkeypatch):
    """trainer.async_checkpoint=true saves orbax step dirs and
    load_checkpoint restores from them via the synthetic latest path."""
    from pathlib import Path

    from neddf_tpu import config as config_lib

    monkeypatch.chdir(tmp_path)
    cfg = config_lib.compose(
        Path(__file__).resolve().parents[2] / "config",
        overrides=[
            "trainer=test",
            "dataset=test",
            f"dataset.dataset_dir={REFERENCE_DATA}",
            "trainer.async_checkpoint=true",
        ],
    )
    tr = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    tr.iteration = 5
    tr.save_checkpoint(Path("models/model_00005.ckpt"))
    tr.finalize_checkpoints()
    assert (tmp_path / "models" / "5").exists()

    tr2 = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    tr2.load_checkpoint(Path("models/model_latest.ckpt"))
    assert tr2.iteration == 5
