"""AsyncCheckpointer: orbax-backed save/restore round-trip + resume."""
import jax.numpy as jnp
import numpy as np

from neddf_tpu.training.checkpoint import AsyncCheckpointer


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
