"""Canonical train-step math, shared by every execution path.

This module is THE single implementation of the per-step loss/gradient
computation (pixel draw -> GT gather -> render -> losses -> grads, with
optional gradient accumulation and camera-pose gradients). It is used
by:

* the single-device jitted step (``training/trainer.py``),
* the shard_map mesh step (``parallel/mesh.py::make_sharded_grads``,
  reached from the trainer's ``mesh`` config flag),
* the library-level ``parallel.make_sharded_train_step`` entry.

Reference twin: neddf/trainer/nerf_trainer.py:81-140 (run_train_step)
plus neddf/trainer/base_trainer.py:206-245 (construct_ground_truth) —
redesigned so the whole step is one traced function with the image
stacks as device-resident arguments.

Mesh invariance: ``draw_pixel_batch`` always draws the FULL global
pixel batch from the step key; a device (or microbatch) keeps its
contiguous row slice. Together with the per-PIXEL render RNG
(ops/sampling.py) every sample draw is a pure function of (key, pixel),
so losses and gradients are independent of how the batch is split
across devices or microbatches (pinned by
tests/parallel/test_mesh_trainer.py::test_pixel_draws_mesh_invariant).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from neddf_tpu.geometry.se3 import camera_pose

Array = jax.Array


def draw_pixel_batch(
    key: Array, batch_size: int, width: int, height: int
) -> Tuple[Array, Array, Array]:
    """Draw the global per-step pixel batch (reference:
    nerf_trainer.py:100-106) and derive the render sub-key.

    Returns (us, vs, k_render). Every caller — single-device, every
    mesh shape, every microbatch split — draws this SAME batch and
    slices, which is what makes training bitwise mesh-invariant.
    """
    k_u, k_v, k_render = jax.random.split(key, 3)
    us = jnp.floor(
        jax.random.uniform(k_u, (batch_size,)) * (width - 1)
    ).astype(jnp.int32)
    vs = jnp.floor(
        jax.random.uniform(k_v, (batch_size,)) * (height - 1)
    ).astype(jnp.int32)
    return us, vs, k_render


#: target keys this step knows how to construct; a loss class whose
#: ``key_target`` is not listed here cannot be trained (clear error in
#: make_local_grads instead of a KeyError mid-trace)
KNOWN_TARGET_KEYS = ("color", "mask", "fields_penalty")


def construct_targets(
    target_keys: Sequence[str], rgb_cam: Array, mask_cam: Array, us: Array, vs: Array
) -> Dict[str, Array]:
    """Device-side GT gather (reference: base_trainer.py:206-245).

    ``target_keys`` are the losses' ``key_target`` attributes (NOT class
    names), so custom BaseLoss subclasses reusing a known target work
    without editing this function.
    """
    targets: Dict[str, Array] = {}
    if "color" in target_keys:
        targets["color"] = (1.0 / 256.0) * rgb_cam[vs, us, :]
    if "mask" in target_keys:
        targets["mask"] = (1.0 / 256.0) * mask_cam[vs, us]
    if "fields_penalty" in target_keys:
        targets["fields_penalty"] = jnp.zeros(us.shape, jnp.float32)
    return targets


def make_local_grads(
    renderer: Any,
    loss_functions: Sequence[Any],
    calib: Any,
    image_width: int,
    image_height: int,
    batch_size: int,
    grad_accum: int = 1,
    optimize_camera: bool = False,
) -> Callable:
    """Build the canonical per-program loss/gradient function.

    Returns ``local_grads(params, camera_deltas, rgb_images,
    mask_images, camera_initials, key, camera_id, iteration, ray_slice,
    local_batch) -> (loss, loss_dict, mse, grads, grads_cam)``:

    * the FULL ``batch_size`` pixel batch is drawn from ``key`` and rows
      [ray_slice, ray_slice + local_batch) are kept — a mesh device
      passes its shard offset, the single-device path passes (0,
      batch_size);
    * ``grad_accum`` splits the LOCAL batch into equal microbatches
      under ``lax.scan`` and averages (numerically equivalent: per-ray
      means over equal sizes + per-pixel render RNG);
    * ``grads_cam`` is the camera-delta gradient pytree when
      ``optimize_camera`` else None.
    """
    target_keys = [fn.key_target for fn in loss_functions]
    unknown = [k for k in target_keys if k not in KNOWN_TARGET_KEYS]
    if unknown:
        raise ValueError(
            f"loss key_target(s) {unknown} have no ground-truth "
            f"constructor; known targets: {KNOWN_TARGET_KEYS} "
            "(training/step.py::construct_targets)"
        )
    if batch_size % grad_accum:
        raise ValueError(f"grad_accum={grad_accum} must divide {batch_size}")

    def local_grads(
        params,
        camera_deltas: Array,
        rgb_images: Array,
        mask_images: Array,
        camera_initials: Array,
        key: Array,
        camera_id: Array,
        iteration: Array,
        ray_slice,
        local_batch: int,
    ):
        # local_batch is a static Python int at trace time — validate the
        # LOCAL split here (the global batch_size check above does not
        # imply per-device divisibility, e.g. batch 8 / data 4 / accum 8)
        if local_batch % grad_accum:
            raise ValueError(
                f"grad_accum={grad_accum} must divide the per-device "
                f"batch {local_batch} (global batch {batch_size})"
            )
        us, vs, k_render = draw_pixel_batch(
            key, batch_size, image_width, image_height
        )
        if local_batch != batch_size:
            us = jax.lax.dynamic_slice(us, (ray_slice,), (local_batch,))
            vs = jax.lax.dynamic_slice(vs, (ray_slice,), (local_batch,))
        uv = jnp.stack([us, vs], axis=1)
        rgb_cam = rgb_images[camera_id]
        mask_cam = mask_images[camera_id]
        targets = construct_targets(target_keys, rgb_cam, mask_cam, us, vs)

        def loss_fn(p, deltas, uv_mb, targets_mb):
            pose_r, pose_t = camera_pose(
                camera_initials[camera_id], deltas[camera_id]
            )
            render_result = renderer.render_rays(
                p, calib, pose_r, pose_t, uv_mb, k_render, iteration
            )
            loss_dict: Dict[str, Array] = {}
            for loss_function in loss_functions:
                loss_dict.update(loss_function(render_result, targets_mb))
            total = sum(loss_dict.values())
            mse = jnp.mean(
                jnp.square(render_result["color"] - targets_mb["color"])
            )
            return total, (loss_dict, mse)

        argnums = (0, 1) if optimize_camera else 0
        value_and_grad = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True
        )
        if grad_accum > 1:
            # sequential microbatches under lax.scan; stacking the tiny
            # (2.5 MB) grad pytrees and averaging afterwards is cheaper
            # than a carried tree-add (kernels/dual_mlp.py docstring for
            # why large monolithic grad programs must be avoided)
            n_micro = grad_accum
            micro = local_batch // n_micro
            uv_s = uv.reshape(n_micro, micro, 2)
            targets_s = jax.tree_util.tree_map(
                lambda t: t.reshape((n_micro, micro) + t.shape[1:]), targets
            )

            def body(_, xs):
                uv_i, targets_i = xs
                (l, (ld, m)), g = value_and_grad(
                    params, camera_deltas, uv_i, targets_i
                )
                return None, (l, ld, m, g)

            _, (losses, loss_dicts, mses, grads_s) = jax.lax.scan(
                body, None, (uv_s, targets_s)
            )
            mean0 = lambda t: jnp.mean(t, axis=0)
            loss = mean0(losses)
            loss_dict = jax.tree_util.tree_map(mean0, loss_dicts)
            mse = mean0(mses)
            grads = jax.tree_util.tree_map(mean0, grads_s)
        else:
            (loss, (loss_dict, mse)), grads = value_and_grad(
                params, camera_deltas, uv, targets
            )
        if optimize_camera:
            grads, grads_cam = grads
        else:
            grads_cam = None
        return loss, loss_dict, mse, grads, grads_cam

    return local_grads
