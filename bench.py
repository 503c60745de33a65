"""Benchmark: NeDDF training throughput (rays/sec/chip) on real hardware.

Measures the full jitted training step of the flagship NeDDF config
(512 rays x (65 coarse + 194 fine) cone samples, width-256 dual-Jacobian
field, losses + backward + Adam — the reference's hot loop,
neddf/trainer/nerf_trainer.py:81-140) on whatever device JAX provides
(the driver runs this on one TPU v5e chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no numbers (BASELINE.md). The
anchor used here is an ESTIMATE of the PyTorch reference's NeDDF train
throughput on one A100: ~512 rays / ~0.2 s per iteration = 2,560 rays/s
(the dual-pair Jacobian layers make each step ~4x a plain NeRF MLP; this
matches the reference's intended 2000-epoch x 100-frame training runs
taking ~days). The driver-defined north star is >= 2x A100 per
BASELINE.json, so vs_baseline = value / (2 * 2560).

MEASURED same-host anchor (2026-08-17, single-core VM, torch 1 thread):
the reference's REAL train step (its NeRFRender/NeDDF modules driven
directly at the flagship shapes — see BASELINE.md "Measured CPU
baseline") does 4.81 rays/s on this host's CPU; our jax-CPU path does
3.64 rays/s on the same core (0.76x — the plane-major/dual-tensor
layout is a TPU design, and jax CPU is not a target). The one real
cross-framework number: one v5e chip does ~4,500x the reference's
same-host CPU throughput. The A100 estimate above remains an estimate;
no GPU exists in this environment to measure it.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

REF_A100_RAYS_PER_SEC = 2560.0  # estimated reference throughput (see docstring)
TARGET = 2.0 * REF_A100_RAYS_PER_SEC

BATCH_SIZE = 512


def _backend_reachable(timeout: float = 300.0) -> bool:
    """Probe backend init in a SUBPROCESS with a timeout.

    The TPU tunnel has a failure mode where the relay dies and
    jax.devices() blocks forever (CLAUDE.md known issues); without this
    guard the benchmark would hang instead of reporting. The probe
    inherits the environment, so it initialises the same backend this
    process would."""
    import subprocess
    import sys

    try:
        rc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ).returncode
    except subprocess.TimeoutExpired:
        return False
    return rc == 0


def main() -> None:
    if not _backend_reachable():
        print(
            json.dumps(
                {
                    "metric": "neddf_train_rays_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "rays/s",
                    "vs_baseline": 0.0,
                    "error": "backend unreachable (TPU tunnel down) — "
                             "no measurement taken; see CLAUDE.md known "
                             "issues",
                }
            )
        )
        return

    from neddf_tpu.geometry import PinholeCalib
    from neddf_tpu.render import NeRFRender
    from neddf_tpu.training.losses import (
        ColorLoss,
        FieldsConstraintLoss,
        MaskBCELoss,
    )
    from neddf_tpu.geometry.se3 import camera_pose

    renderer = NeRFRender(
        network_config={
            "_target_": "neddf_tpu.fields.NeDDF",
            "embed_pos_rank": 10,
            "embed_dir_rank": 4,
            "ddf_layer_count": 8,
            "ddf_layer_width": 256,
            "col_layer_count": 4,
            "col_layer_width": 256,
            "d_near": 0.001,
            "compute_dtype": "bfloat16",
            "penalty_weight": {
                "constraints_aux_grad": 0.05,
                "constraints_dDdt": 1.0,
                "constraints_color": 0.0001,
                "range_distance": 1.0,
                "range_aux_grad": 1.0,
                "range_color": 0.1,
            },
        },
        sample_coarse=64,
        sample_fine=128,
        use_coarse_network=False,
        sampling_type="cone",
    )

    key = jax.random.PRNGKey(3408)
    params = renderer.init(key)
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)
    losses = [ColorLoss(), MaskBCELoss(0.05), FieldsConstraintLoss(0.01)]

    h = w = 500
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(0, 1, (h, w)) > 0.5).astype(np.float32) * 255)
    calib = PinholeCalib(jnp.array([694.4, 694.4, 250.0, 250.0], jnp.float32))
    pose_r, pose_t = camera_pose(
        jnp.array([0.1, -0.2, 0.3, 0.0, 0.0, 4.0], jnp.float32), jnp.zeros(6)
    )

    def train_step(params, opt_state, key, iteration):
        k_u, k_v, k_render = jax.random.split(key, 3)
        us = jnp.floor(
            jax.random.uniform(k_u, (BATCH_SIZE,)) * (w - 1)
        ).astype(jnp.int32)
        vs = jnp.floor(
            jax.random.uniform(k_v, (BATCH_SIZE,)) * (h - 1)
        ).astype(jnp.int32)
        uv = jnp.stack([us, vs], axis=1)
        targets = {
            "color": (1.0 / 256.0) * rgb[vs, us, :],
            "mask": (1.0 / 256.0) * mask[vs, us],
            "fields_penalty": jnp.zeros((BATCH_SIZE,), jnp.float32),
        }

        def loss_fn(p):
            out = renderer.render_rays(
                p, calib, pose_r, pose_t, uv, k_render, iteration
            )
            total = 0.0
            for fn in losses:
                total += sum(fn(out, targets).values())
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    # warmup (compile)
    for i in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, jnp.int32(i))
    jax.block_until_ready(loss)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, jnp.int32(i))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    rays_per_sec = BATCH_SIZE * iters / dt
    print(
        json.dumps(
            {
                "metric": "neddf_train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
