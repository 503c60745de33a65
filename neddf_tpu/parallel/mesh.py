"""Device-mesh parallelism: DP over rays + TP over MLP width.

The reference is strictly single-GPU (no torch.distributed anywhere);
this module is the TPU-native scaling design called for by BASELINE.json:
ray batches shard across the slice (rays are embarrassingly parallel),
parameters are replicated (or width-sharded for tensor parallelism on
wide fields), and XLA/GSPMD inserts the psum for gradient reduction and
the all-gathers for TP activations — no hand-written collectives.

Mesh axes:
    data  — ray/pixel batch axis (pure DP; grads psum over ICI)
    model — MLP width axis (column-parallel weights; optional, size 1
            by default since the reference fields are only 256 wide)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(
    n_devices: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    arr = np.array(devices).reshape(n // model, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def _is_weight(path) -> bool:
    return any(getattr(k, "key", None) == "w" for k in path[-1:])


def field_param_specs(params, model_size: int):
    """PartitionSpec tree for tensor-parallel field params.

    Column-parallel rule: 2-D weights [in, out] shard their out dim over
    'model' when divisible; 1-D biases shard likewise; everything else
    (1/3-wide heads, scalars) replicates. Must stay in lockstep with
    ``shard_field_params`` — the shard_map TP step derives both its
    in/out specs and its gradient rescaling from this tree."""

    def spec(leaf):
        if model_size > 1 and leaf.ndim == 2 and leaf.shape[1] % model_size == 0:
            return P(None, "model")
        if model_size > 1 and leaf.ndim == 1 and leaf.shape[0] % model_size == 0:
            return P("model")
        return P()

    return jax.tree_util.tree_map(spec, params)


def shard_field_params(params, mesh: Mesh):
    """Tensor-parallel placement: weight out-dims and biases shard over
    'model'; with model=1 this degenerates to replication. The TP train
    step reassembles activations with explicit shard_map collectives
    (fields/base.py::tp_gather) rather than GSPMD.

    Why not GSPMD TP: on the virtual CPU mesh the XLA CPU SPMD
    partitioner MISCOMPILES the full multi-output NeDDF apply program
    under width-sharded weights — Jacobian-derived outputs (density,
    penalties) deterministically diverge while every component and the
    density-only program match to f32 roundoff (see
    tests/parallel/test_mesh.py::test_tp_full_apply_matches_density_only,
    an xfail pinning the upstream bug). The shard_map path never invokes
    the partitioner on the field program and is verified numerically
    equal to the single-device step (test_tp_shard_map_*)."""

    model_size = mesh.shape["model"]
    specs = field_param_specs(params, model_size)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)), params, specs
    )


def _tp_renderer(renderer, axis: str = "model"):
    """Shallow-copy the renderer with fields configured for shard_map TP:
    fused kernels off (a Pallas call can't consume width shards) and
    ``tp_axis`` set so the jnp layer loops insert the all-gathers."""
    import copy
    import dataclasses

    shared = renderer.network_coarse is renderer.network_fine
    renderer = copy.copy(renderer)
    renderer.network_fine = dataclasses.replace(
        renderer.network_fine, fused="off", tp_axis=axis
    )
    if shared:
        renderer.network_coarse = renderer.network_fine
    else:
        renderer.network_coarse = dataclasses.replace(
            renderer.network_coarse, fused="off", tp_axis=axis
        )
    return renderer


def make_sharded_train_step(
    renderer,
    loss_functions,
    calib,
    mesh: Mesh,
    tx,
    batch_size: int,
    image_height: int,
    image_width: int,
):
    """Build a jit-compiled full training step over the mesh.

    Two regimes:

    * model == 1 (pure DP, the production regime — the reference fields
      are only 2.5 MB so parameters replicate): the whole per-device
      computation runs under ``jax.shard_map`` over the 'data' axis.
      Each device samples ITS OWN ray sub-batch (key folded with the
      device index), runs the field/Pallas kernels on purely LOCAL
      shards, and the gradients are psum-averaged over ICI. This is the
      correct multi-chip design for Pallas kernels: XLA's SPMD
      partitioner cannot split a custom call, so the GSPMD route would
      all-gather the batch around every kernel.
    * model > 1 (tensor-parallel width sharding): GSPMD whole-program
      partitioning — weights are column-sharded (shard_field_params) and
      XLA derives the activation collectives. The fused kernels are
      bypassed in this regime (the jnp dual path partitions cleanly).

    Returns step(params, opt_state, camera_deltas, rgb_images,
    mask_images, camera_initials, key, camera_id, iteration) ->
    (params, opt_state, loss, mse).
    """
    from neddf_tpu.geometry.se3 import camera_pose

    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    if batch_size % n_data != 0:
        raise ValueError(f"batch_size {batch_size} not divisible by data={n_data}")
    local_batch = batch_size // n_data

    def local_loss(params, camera_deltas, rgb_images, mask_images,
                   camera_initials, key, camera_id, iteration, batch,
                   shard_rays=False, ray_slice=None):
        k_u, k_v, k_render = jax.random.split(key, 3)
        us = jnp.floor(
            jax.random.uniform(k_u, (batch_size,)) * (image_width - 1)
        ).astype(jnp.int32)
        vs = jnp.floor(
            jax.random.uniform(k_v, (batch_size,)) * (image_height - 1)
        ).astype(jnp.int32)
        if ray_slice is not None:  # shard_map regime: take the local slice
            # render RNG is per-pixel inside render_rays, so the slice
            # sees exactly the same draws as the unsharded program
            us = jax.lax.dynamic_slice(us, (ray_slice,), (batch,))
            vs = jax.lax.dynamic_slice(vs, (ray_slice,), (batch,))
        if shard_rays:  # GSPMD regime: pin the ray batch to the data axis
            us = jax.lax.with_sharding_constraint(us, data_sharded(mesh))
            vs = jax.lax.with_sharding_constraint(vs, data_sharded(mesh))
        uv = jnp.stack([us, vs], axis=1)
        rgb_cam = rgb_images[camera_id]
        mask_cam = mask_images[camera_id]
        pose_r, pose_t = camera_pose(
            camera_initials[camera_id], camera_deltas[camera_id]
        )
        targets: Dict[str, Array] = {
            "color": (1.0 / 256.0) * rgb_cam[vs, us, :],
            "mask": (1.0 / 256.0) * mask_cam[vs, us],
            "fields_penalty": jnp.zeros((batch,), jnp.float32),
        }

        def loss_fn(p):
            render_result = renderer.render_rays(
                p, calib, pose_r, pose_t, uv, k_render, iteration
            )
            loss_dict: Dict[str, Array] = {}
            for loss_function in loss_functions:
                if loss_function.key_target not in targets:
                    continue
                loss_dict.update(loss_function(render_result, targets))
            total = sum(loss_dict.values())
            mse = jnp.mean(jnp.square(render_result["color"] - targets["color"]))
            return total, mse

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    if n_model == 1:
        # ---- shard_map DP: local kernels + explicit psum-mean ----------
        def per_device(params, camera_deltas, rgb_images, mask_images,
                       camera_initials, key, camera_id, iteration):
            # every device draws the SAME global pixel batch from the
            # unfolded key and keeps its contiguous slice — the union of
            # rays is identical to an unsharded run, so losses/grads are
            # bitwise mesh-shape-invariant (pmean of equal-size means)
            shard = jax.lax.axis_index("data") * local_batch
            (loss, mse), grads = local_loss(
                params, camera_deltas, rgb_images, mask_images,
                camera_initials, key, camera_id, iteration, local_batch,
                ray_slice=shard,
            )
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            mse = jax.lax.pmean(mse, "data")
            return loss, mse, grads

        rep = P()
        sharded = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(rep,) * 8,
            out_specs=rep,
            check_vma=False,
        )

        def train_step(params, opt_state, camera_deltas, rgb_images,
                       mask_images, camera_initials, key, camera_id, iteration):
            loss, mse, grads = sharded(
                params, camera_deltas, rgb_images, mask_images,
                camera_initials, key, camera_id, iteration,
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss, mse

        return jax.jit(train_step, donate_argnums=(0, 1))

    # ---- shard_map TP: explicit width-shard collectives ----------------
    # Each 'model'-axis device holds a column shard of the trunk weights;
    # the field's jnp path all-gathers activations back to full width
    # after every sharded layer (fields/base.py::tp_gather). Rays shard
    # over 'data' exactly as in the DP regime. This never hands the field
    # program to the GSPMD partitioner — bypassing its documented CPU
    # miscompile (see shard_field_params) — and its per-device programs
    # are ordinary single-device XLA.
    renderer = _tp_renderer(renderer)

    def train_step(params, opt_state, camera_deltas, rgb_images,
                   mask_images, camera_initials, key, camera_id, iteration):
        # spec tree from the GLOBAL param shapes (available at trace
        # time); must match the placement rule of shard_field_params
        param_specs = field_param_specs(params, n_model)

        def per_device_tp(params_local, camera_deltas, rgb_images,
                          mask_images, camera_initials, key, camera_id,
                          iteration):
            shard = jax.lax.axis_index("data") * local_batch
            (loss, mse), grads = local_loss(
                params_local, camera_deltas, rgb_images, mask_images,
                camera_initials, key, camera_id, iteration, local_batch,
                ray_slice=shard,
            )
            # Grad-inside-shard_map computes d(sum over devices of
            # loss_j)/d(input_i). Every model-row device computes the
            # SAME loss from the gathered activations, so a
            # column-sharded leaf (consumed by all row devices through
            # the all_gather) comes back scaled by n_model, while a
            # replicated head leaf (consumed only by its own device's
            # loss) is exact. Undo the factor spec-wise; n_model is a
            # power of two so the division is exact.
            grads = jax.tree_util.tree_map(
                lambda g, s: g / n_model if s != P() else g,
                grads, param_specs,
            )
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            mse = jax.lax.pmean(mse, "data")
            return loss, mse, grads

        rep = P()
        loss, mse, grads = jax.shard_map(
            per_device_tp,
            mesh=mesh,
            in_specs=(param_specs,) + (rep,) * 7,
            out_specs=(rep, rep, param_specs),
            check_vma=False,
        )(params, camera_deltas, rgb_images, mask_images,
          camera_initials, key, camera_id, iteration)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, mse

    return jax.jit(train_step, donate_argnums=(0, 1))


def make_sharded_render(renderer, calib, mesh: Mesh):
    """Eval-time renderer returning fully-replicated tiles — the
    'all-gather of rendered tiles' from BASELINE.json.

    model == 1: pixel chunks shard over the full mesh under GSPMD (pure
    DP partitions cleanly; verified bit-near vs single device). model >
    1: shard_map — pixels shard over 'data', the model axis runs the
    explicit-collective TP apply (see make_sharded_train_step), and the
    output replicates; keeps the field program away from the GSPMD
    partitioner's documented CPU TP miscompile."""

    n_model = mesh.shape["model"]
    if n_model == 1:
        every = NamedSharding(mesh, P(("data", "model")))

        def render(params, pose_r, pose_t, uv, key):
            uv = jax.lax.with_sharding_constraint(uv, every)
            out = renderer.render_rays(params, calib, pose_r, pose_t, uv, key, -1)
            return {
                k: jax.lax.with_sharding_constraint(v, replicated(mesh))
                for k, v in out.items()
                if k in ("color", "depth", "transmittance")
            }

        return jax.jit(render)

    tp_r = _tp_renderer(renderer)
    n_data = mesh.shape["data"]

    def render(params, pose_r, pose_t, uv, key):
        param_specs = field_param_specs(params, n_model)
        if uv.shape[0] % n_data:
            raise ValueError(
                f"uv rows {uv.shape[0]} not divisible by data={n_data}"
            )

        def per_device(params_local, pose_r, pose_t, uv_local, key):
            out = tp_r.render_rays(
                params_local, calib, pose_r, pose_t, uv_local, key, -1
            )
            return {
                k: v for k, v in out.items()
                if k in ("color", "depth", "transmittance")
            }

        out = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(param_specs, P(), P(), P("data"), P()),
            out_specs=P("data"),
            check_vma=False,
        )(params, pose_r, pose_t, uv, key)
        return {
            k: jax.lax.with_sharding_constraint(v, replicated(mesh))
            for k, v in out.items()
        }

    return jax.jit(render)
