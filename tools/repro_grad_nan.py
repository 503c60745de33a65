"""Standalone repro for the B>=4096 monolithic-grad XLA miscompile.

THE BUG (first observed 2026-08-15 on v5e-1, jax 0.9.x via the axon
tunnel; documented in kernels/dual_mlp.py): compiling ONE grad program
over the full flagship NeDDF render (64+128 cone samples, 8x256 dual
trunk + 4x256 color branch Pallas kernels) at a train batch of 4096
rays deterministically produces NaNs in the parameter gradients — in
BOTH f32 and bf16 compute, with the per-ray NaN pattern a contiguous
~14% block of EARLY rays with onset mid-ray, unchanged across two
independent kernel rewrites and with the kernel calls chunked — while
the IDENTICAL forward-only program is clean and every kernel call is
individually verified against its jnp twin at these row counts. That
signature (program-scale-dependent, kernel-rewrite-invariant, forward
clean) points at the XLA-level compilation of the grad program, not at
a kernel defect.

B = 2048 is verified clean end-to-end; shipping configs (<=1024 rays)
never enter the regime, and the trainer's grad_accum guard
(training/trainer.py) auto-splits any user batch so no config can reach
it. NOTE: with the (default) HBM pre-activation stash backward the
B=4096 monolithic program now fails LOUDLY at compile time instead
(~31GB of stash residuals -> compile OOM), so this repro pins the
silent-NaN mode via ``bwd_stash(False)`` (recompute backward), where
the program compiles and mis-runs.

Usage (TPU; each batch size is a fresh 1-3 min compile on the tunnel):

    python tools/repro_grad_nan.py              # sweep the boundary:
                                                # 1024 2048 3072 4096
    python tools/repro_grad_nan.py 4096         # single repro
    python tools/repro_grad_nan.py 4096 --stash # stash backward (expect
                                                # a compile-time OOM)
    python tools/repro_grad_nan.py 4096 --f32   # f32 compute (also NaNs)

Result log (v5e-1 via the axon tunnel, this script):

    2026-08-19  B in {1024, 2048, 3072, 4096}, recompute backward,
                bf16, eval AND training (it=0) schedules:
                **grads CLEAN at every size** — the silent-NaN mode of
                2026-08-15 does NOT reproduce on the current toolchain.
                B=4096 with the default stash backward still fails
                loudly at compile time (HTTP 500 from the remote
                compiler = tpu_compile_helper exit 1, the ~31GB stash
                residual OOM), exactly as documented.

Consequences: the trainer's grad_accum auto-guard
(training/trainer.py::_MAX_MONOLITHIC_RAYS) REMAINS required — with the
default stash backward, microbatches above ~2048 rays don't compile at
all — but its role on this toolchain is the loud OOM, not the silent
miscompile. Keep re-running this sweep on toolchain updates; the NaN
history is kept in kernels/dual_mlp.py for the day it resurfaces.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax  # noqa: F401  (parity with the trainer's import environment)


def build_grad_fn(batch: int, compute_dtype: str, iteration: int = 0):
    """The smallest program exhibiting the failure: value_and_grad of
    the flagship training loss (ColorLoss + MaskBCE + FieldsConstraint)
    over one monolithic render of ``batch`` rays. No optimizer, no
    camera deltas, no image stacks — those were all eliminated from the
    original trainer program without changing the NaN pattern."""
    from neddf_tpu.geometry import PinholeCalib
    from neddf_tpu.geometry.se3 import camera_pose
    from neddf_tpu.render import NeRFRender
    from neddf_tpu.training.losses import (
        ColorLoss,
        FieldsConstraintLoss,
        MaskBCELoss,
    )

    renderer = NeRFRender(
        network_config={
            "_target_": "neddf_tpu.fields.NeDDF",
            "embed_pos_rank": 10, "embed_dir_rank": 4,
            "ddf_layer_count": 8, "ddf_layer_width": 256,
            "col_layer_count": 4, "col_layer_width": 256,
            "d_near": 0.001, "compute_dtype": compute_dtype,
            "penalty_weight": {
                "constraints_aux_grad": 0.05, "constraints_dDdt": 1.0,
                "constraints_color": 0.0001, "range_distance": 1.0,
                "range_aux_grad": 1.0, "range_color": 0.1,
            },
        },
        sample_coarse=64, sample_fine=128, use_coarse_network=False,
        sampling_type="cone",
    )
    params = renderer.init(jax.random.PRNGKey(3408))
    losses = [ColorLoss(), MaskBCELoss(0.05), FieldsConstraintLoss(0.01)]
    w = h = 500
    calib = PinholeCalib(jnp.array([694.4, 694.4, 250.0, 250.0], jnp.float32))
    pose_r, pose_t = camera_pose(
        jnp.array([0.1, -0.2, 0.3, 0.0, 0.0, 4.0], jnp.float32), jnp.zeros(6)
    )
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (batch, 3)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(0, 1, (batch,)) > 0.5).astype(np.float32)
    )

    def loss_fn(p, key):
        k_u, k_v, k_render = jax.random.split(key, 3)
        us = jnp.floor(jax.random.uniform(k_u, (batch,)) * (w - 1))
        vs = jnp.floor(jax.random.uniform(k_v, (batch,)) * (h - 1))
        uv = jnp.stack([us, vs], axis=1).astype(jnp.int32)
        targets = {
            "color": rgb,
            "mask": mask,
            "fields_penalty": jnp.zeros((batch,), jnp.float32),
        }
        out = renderer.render_rays(
            p, calib, pose_r, pose_t, uv, k_render, iteration
        )
        return sum(sum(fn(out, targets).values()) for fn in losses)

    return renderer, params, loss_fn


def run_one(batch: int, stash: bool, compute_dtype: str,
            forward_only: bool = False, iteration: int = 0) -> None:
    import neddf_tpu.kernels.dual_mlp as K

    _, params, loss_fn = build_grad_fn(batch, compute_dtype, iteration)
    key = jax.random.PRNGKey(7)
    mode = "stash" if stash else "recompute"
    tag = f"B={batch:5d}  {mode} {compute_dtype:8s} it={iteration}"
    with K.bwd_stash(stash):
        try:
            if forward_only:
                loss = jax.jit(loss_fn)(params, key)
                jax.block_until_ready(loss)
                print(f"{tag}  FORWARD-ONLY loss={float(loss):.3e}  "
                      f"{'CLEAN' if np.isfinite(float(loss)) else 'NON-FINITE'}",
                      flush=True)
                return
            loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, key)
            jax.block_until_ready(loss)
        except Exception as e:  # compile OOM is an expected stash outcome
            print(f"{tag}  COMPILE/RUN FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            return
    leaves = jax.tree_util.tree_leaves(jax.device_get(grads))
    bad = [i for i, g in enumerate(leaves) if not np.all(np.isfinite(g))]
    verdict = (
        f"grads NON-FINITE: {len(bad)}/{len(leaves)} leaves"
        if bad else "grads CLEAN"
    )
    print(f"{tag}  loss={float(loss):.3e}  {verdict}", flush=True)


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    stash = "--stash" in argv
    f32 = "--f32" in argv
    forward_only = "--forward-only" in argv
    iteration = 0  # mid-warmup training schedule (the original regime)
    if "--iteration" in argv:
        i = argv.index("--iteration")
        iteration = int(argv[i + 1])
        del argv[i:i + 2]
    batches = [int(a) for a in argv if not a.startswith("--")]
    if not batches:
        batches = [1024, 2048, 3072, 4096]
    for b in batches:
        run_one(b, stash, "float32" if f32 else "bfloat16",
                forward_only=forward_only, iteration=iteration)


if __name__ == "__main__":
    main()
