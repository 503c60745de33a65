"""grad_accum microbatched steps must match the monolithic step.

The microbatch split relies on (a) per-PIXEL RNG so sample draws are
independent of the batch layout (neddf_tpu/ops/sampling.py) and (b)
per-ray-mean losses over equal-size microbatches averaging to the full
batch mean. This pins both: one step with grad_accum=4 lands on the same
parameters as grad_accum=1 up to f32 summation-order noise.
"""

import jax
import numpy as np
import pytest

from neddf_tpu import config as config_lib

from tests.training.test_trainer import tiny_config


def _make_trainer(grad_accum: int):
    cfg = tiny_config()
    cfg["trainer"]["grad_accum"] = grad_accum
    return config_lib.instantiate(cfg["trainer"], global_config=cfg)


def test_grad_accum_matches_monolithic_step():
    t1 = _make_trainer(1)
    t4 = _make_trainer(4)
    # same seed -> identical init params and key streams
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t4.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    loss1 = t1.run_train_step(0)
    loss4 = t4.run_train_step(0)
    t1._flush_logs()
    t4._flush_logs()
    assert np.isfinite(loss1) and np.isfinite(loss4)
    assert abs(loss1 - loss4) < 1e-4 * max(1.0, abs(loss1))
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t4.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_grad_accum_composes_with_camera_optimization():
    """The scan body carries (params, camera_deltas) grad TUPLES."""
    cfg = tiny_config()
    cfg["trainer"].update({"grad_accum": 2, "optimize_camera": True})
    tr = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    before = np.asarray(tr.camera_deltas).copy()
    losses = [tr.run_train_step(0) for _ in range(2)]
    tr._flush_logs()
    assert all(np.isfinite(l) for l in losses)
    after = np.asarray(tr.camera_deltas)
    # pose deltas actually moved for the trained camera
    assert np.abs(after[0]).sum() > 0.0
    assert not np.allclose(before, after)


def test_grad_accum_validation():
    cfg = tiny_config()
    cfg["trainer"]["grad_accum"] = 5  # does not divide batch_size=16
    with pytest.raises(ValueError):
        config_lib.instantiate(cfg["trainer"], global_config=cfg)


@pytest.mark.parametrize(
    "batch,accum,expect",
    [
        (4096, 1, 2),   # documented miscompile regime -> auto-raised
        (8192, 2, 4),   # partially-accumulated but still too big
        (2048, 1, 1),   # verified boundary stays untouched
        (4096, 4, 4),   # user already safe stays untouched
        (6144, 1, 3),   # non-power-of-two: smallest dividing accum
    ],
)
def test_large_batch_guard_auto_raises_grad_accum(batch, accum, expect):
    """No config may reach the documented >2048-ray monolithic grad
    miscompile (kernels/dual_mlp.py docstring): the trainer must raise
    grad_accum until every microbatch is <= 2048 rays."""
    cfg = tiny_config()
    cfg["trainer"].update({"batch_size": batch, "grad_accum": accum})
    tr = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    assert tr.grad_accum == expect
    assert batch // tr.grad_accum <= 2048


def test_optimize_camera_auto_raises_grad_accum():
    """v5e guard: the monolithic pose-gradient program faults the TPU
    worker (kernels/dual_mlp.py "SIBLING FAILURE"), so optimize_camera
    with grad_accum=1 must auto-raise to the smallest divisor >= 2 on
    TPU, while CPU (jnp field path, clean) keeps the exact grad_accum=1
    trajectory the calibrated capability tests pin."""
    from neddf_tpu.training.trainer import _pose_grad_accum_guard

    assert _pose_grad_accum_guard(True, 1, 512, "tpu") == 2
    assert _pose_grad_accum_guard(True, 1, 512, "axon") == 2
    assert _pose_grad_accum_guard(True, 1, 9, "tpu") == 3  # smallest divisor
    assert _pose_grad_accum_guard(True, 1, 512, "cpu") is None
    assert _pose_grad_accum_guard(True, 4, 512, "tpu") is None  # explicit ga
    assert _pose_grad_accum_guard(False, 1, 512, "tpu") is None
    assert _pose_grad_accum_guard(True, 1, 1, "tpu") is None  # no divisor

    # CPU trainer instantiation: guard is a no-op
    cfg = tiny_config()
    cfg["trainer"].update({"optimize_camera": True})
    tr = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    assert tr.grad_accum == 1
    # explicit user grad_accum is respected everywhere
    cfg2 = tiny_config()
    cfg2["trainer"].update({"optimize_camera": True, "grad_accum": 4})
    tr2 = config_lib.instantiate(cfg2["trainer"], global_config=cfg2)
    assert tr2.grad_accum == 4
