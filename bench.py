"""Benchmark: NeDDF training throughput (rays/sec/chip) on real hardware.

Measures the full jitted training step of the flagship NeDDF config
(512 rays x (65 coarse + 194 fine) cone samples, width-256 dual-Jacobian
field, losses + backward + Adam — the reference's hot loop,
neddf/trainer/nerf_trainer.py:81-140) on whatever device JAX provides
(the driver runs this on one TPU v5e chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu",
"flops_per_step", "ms_per_step", ...}. ``value`` stays the
reference-shape (batch 512) number for round-over-round continuity;
``peak_*`` fields report the measured large-batch throughput frontier
(BASELINE.md "Batch-size throughput frontier").

MFU accounting (round-4 verdict #4): ``mfu`` is MODEL-FLOPs utilization
— the analytic matmul FLOPs the flagship step is defined by, divided by
measured step time and the chip's bf16 peak (197 TFLOP/s on v5e). The
count walks the ACTUAL param pytree (so skip-layer fan-ins and head
widths are exact) and multiplies by the model's stream counts: the DDF
trunk and its two heads run 4 streams (value + 3 Jacobian planes — the
Jacobian IS model output, NeDDF's density needs grad D), the color
branch runs 2 (value + the K=1 directional tangent; the tangent-less
PE(dir)/normal input segments of its first layer are subtracted).
Backward = 2x forward (dX + dW), the standard model-FLOPs convention —
kernel-internal recompute (the epilogue's two head re-dots) and all
VPU elementwise work (PE trig, activations, compositing, Adam) are
excluded, so the true hardware utilization is slightly HIGHER than the
reported mfu.

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
# measured throughput frontier (BASELINE.md "Batch-size throughput
# frontier", 2026-08-20): per-ray throughput is FLAT-to-negative in
# batch — the glue is per-ray work, nothing amortises — so B=512 is
# both the parity shape AND the frontier. The larger-batch point is
# still benched each run as a regression probe for that finding.
PEAK_BATCH_SIZE = 2048

V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e per-chip bf16 peak


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


def build_flagship_renderer():
    """The flagship NeDDF renderer — the shape every throughput number
    in BASELINE.md refers to."""
    from neddf_tpu.render import NeRFRender

    return NeRFRender(
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


def build_flagship_step(batch_size: int, grad_accum: int = 1):
    """(jitted step, params, opt_state, key) for the flagship train
    step at ``batch_size`` rays. ``grad_accum`` > 1 splits the batch
    into that many lax.scan microbatches with averaged grads — exactly
    the trainer's ``trainer.grad_accum`` regime (training/step.py)."""
    from neddf_tpu.geometry import PinholeCalib
    from neddf_tpu.geometry.se3 import camera_pose
    from neddf_tpu.training.losses import (
        ColorLoss,
        FieldsConstraintLoss,
        MaskBCELoss,
    )

    renderer = build_flagship_renderer()
    key = jax.random.PRNGKey(3408)
    params = renderer.init(key)
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)
    losses = [ColorLoss(), MaskBCELoss(0.05), FieldsConstraintLoss(0.01)]

    h = w = 500
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(0, 1, (h, w)) > 0.5).astype(np.float32) * 255
    )
    calib = PinholeCalib(jnp.array([694.4, 694.4, 250.0, 250.0], jnp.float32))
    pose_r, pose_t = camera_pose(
        jnp.array([0.1, -0.2, 0.3, 0.0, 0.0, 4.0], jnp.float32), jnp.zeros(6)
    )
    assert batch_size % grad_accum == 0
    micro = batch_size // grad_accum

    def micro_loss(p, uv, targets, k_render, iteration):
        out = renderer.render_rays(
            p, calib, pose_r, pose_t, uv, k_render, iteration
        )
        total = 0.0
        for fn in losses:
            total += sum(fn(out, targets).values())
        return total

    def train_step(params, opt_state, key, iteration):
        k_u, k_v, k_render = jax.random.split(key, 3)
        us = jnp.floor(
            jax.random.uniform(k_u, (batch_size,)) * (w - 1)
        ).astype(jnp.int32)
        vs = jnp.floor(
            jax.random.uniform(k_v, (batch_size,)) * (h - 1)
        ).astype(jnp.int32)
        uv = jnp.stack([us, vs], axis=1)
        targets = {
            "color": (1.0 / 256.0) * rgb[vs, us, :],
            "mask": (1.0 / 256.0) * mask[vs, us],
            "fields_penalty": jnp.zeros((batch_size,), jnp.float32),
        }

        if grad_accum == 1:
            loss, grads = jax.value_and_grad(micro_loss)(
                params, uv, targets, k_render, iteration
            )
        else:
            uv_m = uv.reshape(grad_accum, micro, 2)
            tg_m = jax.tree_util.tree_map(
                lambda a: a.reshape(grad_accum, micro, *a.shape[1:]), targets
            )
            keys = jax.random.split(k_render, grad_accum)

            def body(carry, inp):
                loss_a, grads_a = carry
                uv_i, tg_i, k_i = inp
                li, gi = jax.value_and_grad(micro_loss)(
                    params, uv_i, tg_i, k_i, iteration
                )
                grads_a = jax.tree_util.tree_map(jnp.add, grads_a, gi)
                return (loss_a + li, grads_a), None

            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params
            )
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.float32(0.0), zero), (uv_m, tg_m, keys)
            )
            scale = 1.0 / grad_accum
            loss = loss * scale
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    return step, params, opt_state, key


def measure_step(step, params, opt_state, key, warmup: int = 3,
                 iters: int = 30):
    """(seconds per step, last loss). Steps are param-chained, so the
    tunnel's dispatch overlap cannot hide real execution time."""
    for i in range(warmup):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, jnp.int32(i))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, jnp.int32(i))
    loss = jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / iters, float(loss)


def flagship_matmul_flops(params, batch_size: int,
                          sample_coarse: int = 64,
                          sample_fine: int = 128,
                          embed_pos_rank: int = 10,
                          embed_dir_rank: int = 4) -> float:
    """Analytic MODEL matmul FLOPs of one flagship train step (see
    module docstring for the convention). Exact w.r.t. layer shapes:
    walks the live param pytree."""
    net = params["network_fine"]
    # rows through the field: coarse pass evaluates sc+1 samples/ray,
    # the fine pass re-evaluates the merged sc+1 + sf+1 set
    rows = batch_size * ((sample_coarse + 1) + (sample_coarse + 1)
                         + (sample_fine + 1))

    def mm(w) -> int:  # one [in,out] matmul, per row
        return 2 * w.shape[0] * w.shape[1]

    trunk = sum(mm(l["w"]) for l in net["layers_ddf"])
    heads = mm(net["layer_ddf_out"]["w"]) + mm(net["layer_aux_out"]["w"])
    col_layers = net["layers_col"]
    col_value = sum(mm(l["w"]) for l in col_layers)
    col_head_v = mm(net["layer_col_out"]["w"])
    # tangent stream: first layer skips the tangent-less PE(dir)+normal
    # input segments (embed_dir_rank*6 + 3 columns)
    tangentless = embed_dir_rank * 6 + 3
    col_tangent = (
        col_value - 2 * tangentless * col_layers[0]["w"].shape[1]
    )
    per_row_fwd = (
        4 * (trunk + heads)                     # dual value + 3 J planes
        + col_value + col_tangent               # K=1 directional color
        + col_head_v * 2                        # head on value + tangent
    )
    return 3.0 * per_row_fwd * rows             # fwd + 2x fwd backward


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

    step, params, opt_state, key = build_flagship_step(BATCH_SIZE)
    flops = flagship_matmul_flops(params, BATCH_SIZE)
    dt, _ = measure_step(step, params, opt_state, key)
    rays_per_sec = BATCH_SIZE / dt
    result = {
        "metric": "neddf_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / TARGET, 3),
        "ms_per_step": round(dt * 1e3, 2),
        "flops_per_step": flops,
        "mfu": round(flops / dt / V5E_BF16_PEAK_FLOPS, 4),
    }

    if PEAK_BATCH_SIZE and PEAK_BATCH_SIZE != BATCH_SIZE:
        stepP, paramsP, optP, keyP = build_flagship_step(PEAK_BATCH_SIZE)
        flopsP = flagship_matmul_flops(paramsP, PEAK_BATCH_SIZE)
        dtP, lossP = measure_step(stepP, paramsP, optP, keyP, iters=15)
        if np.isfinite(lossP):
            result.update(
                {
                    "peak_batch_size": PEAK_BATCH_SIZE,
                    "peak_rays_per_sec": round(PEAK_BATCH_SIZE / dtP, 1),
                    "peak_ms_per_step": round(dtP * 1e3, 2),
                    "peak_mfu": round(
                        flopsP / dtP / V5E_BF16_PEAK_FLOPS, 4
                    ),
                }
            )
        else:  # fail loud, never report a NaN-producing shape as perf
            result["peak_error"] = (
                f"non-finite loss at B={PEAK_BATCH_SIZE}"
            )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
