"""Same-session A/B harness for flagship-step kernel variants.

Every performance claim in BASELINE.md comes from SAME-SESSION pairs:
the tunneled TPU backend's step time drifts a few percent between
sessions, so cross-session comparisons can show phantom wins. This tool
builds a FRESH jitted train step per variant (the kernel toggles are
trace-time flags — see kernels/dual_mlp.py::bwd_stash) and measures a
data-dependent step chain, interleaving variants A/B/.../A so drift is
visible in the output.

Usage (TPU):
    python tools/ab_flagship.py stash_stride 1 2 3
    python tools/ab_flagship.py pe_in_kernel off trunk both
    python tools/ab_flagship.py bwd_stash on off
    python tools/ab_flagship.py epilogue on off
    python tools/ab_flagship.py baseline        # single measurement
    python tools/ab_flagship.py neus_normals reverse sweep dual
"""
from __future__ import annotations

import sys
import time
from contextlib import nullcontext

import jax
import jax.numpy as jnp
import numpy as np
import optax

B = 512


NEDDF_CFG = {
    "_target_": "neddf_tpu.fields.NeDDF",
    "embed_pos_rank": 10, "embed_dir_rank": 4,
    "ddf_layer_count": 8, "ddf_layer_width": 256,
    "col_layer_count": 4, "col_layer_width": 256,
    "d_near": 0.001, "compute_dtype": "bfloat16",
    "penalty_weight": {
        "constraints_aux_grad": 0.05, "constraints_dDdt": 1.0,
        "constraints_color": 0.0001, "range_distance": 1.0,
        "range_aux_grad": 1.0, "range_color": 0.1,
    },
}
# the reference neus config shapes (config/network/neus.yaml)
NEUS_CFG_BASE = {
    "_target_": "neddf_tpu.fields.NeuS",
    "embed_pos_rank": 6, "embed_dir_rank": 4,
    "sdf_layer_count": 8, "sdf_layer_width": 256,
    "col_layer_count": 8, "col_layer_width": 256,
}

_NET_CFG = [dict(NEDDF_CFG)]  # knob-selected network config


def _build():
    from neddf_tpu.geometry import PinholeCalib
    from neddf_tpu.geometry.se3 import camera_pose
    from neddf_tpu.render import NeRFRender
    from neddf_tpu.training.losses import (
        ColorLoss,
        FieldsConstraintLoss,
        MaskBCELoss,
    )

    renderer = NeRFRender(
        network_config=dict(_NET_CFG[0]),
        sample_coarse=64, sample_fine=128, use_coarse_network=False,
        sampling_type="cone",
    )
    key = jax.random.PRNGKey(3408)
    params = renderer.init(key)
    tx = optax.adam(5e-4)
    losses = [ColorLoss(), MaskBCELoss(0.05)]
    if "NeDDF" in _NET_CFG[0]["_target_"]:
        losses.append(FieldsConstraintLoss(0.01))
    h = w = 500
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(0, 1, (h, w)) > 0.5).astype(np.float32) * 255
    )
    calib = PinholeCalib(jnp.array([694.4, 694.4, 250.0, 250.0], jnp.float32))
    pose_r, pose_t = camera_pose(
        jnp.array([0.1, -0.2, 0.3, 0.0, 0.0, 4.0], jnp.float32),
        jnp.zeros(6),
    )

    def train_step(params, opt_state, key, iteration):
        k_u, k_v, k_render = jax.random.split(key, 3)
        us = jnp.floor(jax.random.uniform(k_u, (B,)) * (w - 1)).astype(
            jnp.int32
        )
        vs = jnp.floor(jax.random.uniform(k_v, (B,)) * (h - 1)).astype(
            jnp.int32
        )
        uv = jnp.stack([us, vs], axis=1)
        targets = {
            "color": (1.0 / 256.0) * rgb[vs, us, :],
            "mask": (1.0 / 256.0) * mask[vs, us],
            "fields_penalty": jnp.zeros((B,), jnp.float32),
        }

        def loss_fn(p):
            out = renderer.render_rays(
                p, calib, pose_r, pose_t, uv, k_render, iteration
            )
            return sum(sum(fn(out, targets).values()) for fn in losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step, params, tx, key


def run(tag: str, iters: int = 40) -> float:
    train_step, params0, tx, key0 = _build()
    step = jax.jit(train_step, donate_argnums=(0, 1))
    params = jax.tree.map(jnp.copy, params0)
    opt_state = tx.init(params)
    key = key0
    for i in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, jnp.int32(i))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, jnp.int32(i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{tag:18s} {dt * 1e3:7.2f} ms  {B / dt:9.0f} rays/s  "
        f"loss={float(loss):.5f}",
        flush=True,
    )
    return dt


def _context(knob: str, value: str):
    import neddf_tpu.fields.neddf as F
    import neddf_tpu.kernels.dual_mlp as K

    if knob == "stash_stride":
        return K.stash_stride(int(value))
    if knob == "pe_in_kernel":
        return F.pe_in_kernel(value)
    if knob == "bwd_stash":
        return K.bwd_stash(value == "on")
    if knob == "epilogue":
        return F.use_epilogue(value == "on")
    if knob == "neus_normals":
        # knob selects the NETWORK CONFIG, not a trace-time flag
        _NET_CFG[0] = dict(NEUS_CFG_BASE, normals=value)
        return nullcontext()
    if knob == "mlp_stash":
        # stashed vs recompute mlp_seg backward, on the NeuS config
        # (its 8x256 color branch is the biggest mlp_seg consumer)
        import neddf_tpu.kernels.mlp as M

        _NET_CFG[0] = dict(NEUS_CFG_BASE, normals="sweep")
        return M.mlp_stash(value == "on")
    if knob == "nerf_mlp_stash":
        # same toggle on the NeRF family (mlp_seg trunk + color head)
        import neddf_tpu.kernels.mlp as M

        _NET_CFG[0] = {
            "_target_": "neddf_tpu.fields.NeRF",
            "embed_pos_rank": 10, "embed_dir_rank": 4,
            "layer_count": 8, "layer_width": 256,
            "compute_dtype": "bfloat16",
        }
        return M.mlp_stash(value == "on")
    if knob == "pe_packed":
        # lane-packed PE chain (ops/pe.py::positional_encoding_mip) on
        # the NeDDF flagship config
        import neddf_tpu.ops.pe as P

        return P.pe_packed(value == "on")
    if knob == "nerf_pe_packed":
        # same toggle on the NeRF family (its [N,30] PE glue measured
        # ~0.9 ms = 17% of the 5.4 ms device step in the 2026-08-19
        # trace: multiply_convert + sine_convert fusions)
        import neddf_tpu.ops.pe as P

        _NET_CFG[0] = {
            "_target_": "neddf_tpu.fields.NeRF",
            "embed_pos_rank": 10, "embed_dir_rank": 4,
            "layer_count": 8, "layer_width": 256,
            "compute_dtype": "bfloat16",
        }
        return P.pe_packed(value == "on")
    if knob == "sdf_tile_bwd":
        # sweep-kernel backward tile (module constant, read at trace
        # time like the other toggles); runs the NeuS sweep config
        import neddf_tpu.kernels.sdf_mlp as S

        _NET_CFG[0] = dict(NEUS_CFG_BASE, normals="sweep")
        S.TILE_M_BWD = int(value)
        return nullcontext()
    if knob == "baseline":
        return nullcontext()
    raise SystemExit(f"unknown knob {knob!r}")


def main() -> None:
    argv = sys.argv[1:]
    if not argv:
        raise SystemExit(__doc__)
    knob, values = argv[0], argv[1:] or ["-"]
    # interleave: A B C ... then the first value again to expose drift
    seq = values + values[:1] if len(values) > 1 else values
    for v in seq:
        with _context(knob, v):
            run(f"{knob}={v}")


if __name__ == "__main__":
    main()
