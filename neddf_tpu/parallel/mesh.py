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

from typing import Any, Optional, Sequence

import jax
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


def field_param_specs(params: Any, model_size: int) -> Any:
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


def shard_field_params(params: Any, mesh: Mesh) -> Any:
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


def tp_renderer(renderer: Any, axis: str = "model") -> Any:
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


def make_sharded_grads(
    mesh: Mesh,
    local_grads: Any,
    batch_size: int,
) -> Any:
    """Wrap the canonical per-program gradient function in shard_map.

    ``local_grads`` is the function built by
    ``training.step.make_local_grads`` — THE shared loss/step
    implementation; this wrapper only adds the mesh semantics:

    * rays shard over 'data': each device keeps its contiguous slice of
      the global pixel batch (offset = axis_index * local_batch), so
      the union of rays is identical to an unsharded run and losses /
      grads are mesh-shape-invariant (pmean of equal-size means);
    * model == 1 (pure DP, the production regime — the reference fields
      are only 2.5 MB so parameters replicate): per-device programs run
      the field/Pallas kernels on purely LOCAL shards and gradients are
      psum-averaged over ICI. This is the correct multi-chip design for
      Pallas kernels: XLA's SPMD partitioner cannot split a custom
      call, so a GSPMD route would all-gather the batch around every
      kernel;
    * model > 1 (tensor-parallel width sharding): the caller passes a
      ``local_grads`` built on ``tp_renderer(...)`` (fused kernels off,
      explicit all-gathers via the fields' ``tp_axis``). Grad-inside-
      shard_map computes d(sum over devices of loss_j)/d(input_i):
      every model-row device computes the SAME loss from the gathered
      activations, so a column-sharded leaf (consumed by all row
      devices through the all_gather) comes back scaled by n_model,
      while a replicated head leaf (consumed only by its own device's
      loss) is exact — undo the factor spec-wise. Camera-delta grads
      split across model devices (each device's backward sees only the
      paths through its own weight columns, scaled by n_model), so
      pmean over 'model' reassembles the exact full gradient
      (pinned by tests/parallel/test_mesh_trainer.py).

    Returns a traceable ``grads_fn(params, camera_deltas, rgb_images,
    mask_images, camera_initials, key, camera_id, iteration) -> (loss,
    loss_dict, mse, grads, grads_cam)`` for embedding in a larger jit
    (e.g. the trainer's full step with optimizer updates).
    """
    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    if batch_size % n_data != 0:
        raise ValueError(f"batch_size {batch_size} not divisible by data={n_data}")
    local_batch = batch_size // n_data

    def grads_fn(params, camera_deltas, rgb_images, mask_images,
                 camera_initials, key, camera_id, iteration):
        # spec tree from the GLOBAL param shapes (available at trace
        # time); must match the placement rule of shard_field_params
        param_specs = field_param_specs(params, n_model)

        def per_device(params_local, camera_deltas, rgb_images,
                       mask_images, camera_initials, key, camera_id,
                       iteration):
            shard = jax.lax.axis_index("data") * local_batch
            loss, loss_dict, mse, grads, grads_cam = local_grads(
                params_local, camera_deltas, rgb_images, mask_images,
                camera_initials, key, camera_id, iteration, shard,
                local_batch,
            )
            if n_model > 1:
                # n_model is a power of two so the division is exact
                grads = jax.tree_util.tree_map(
                    lambda g, s: g / n_model if s != P() else g,
                    grads, param_specs,
                )
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            loss_dict = jax.lax.pmean(loss_dict, "data")
            mse = jax.lax.pmean(mse, "data")
            if grads_cam is not None:
                axes = ("data", "model") if n_model > 1 else "data"
                grads_cam = jax.lax.pmean(grads_cam, axes)
            return loss, loss_dict, mse, grads, grads_cam

        rep = P()
        return jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(param_specs,) + (rep,) * 7,
            out_specs=(rep, rep, rep, param_specs, rep),
            check_vma=False,
        )(params, camera_deltas, rgb_images, mask_images,
          camera_initials, key, camera_id, iteration)

    return grads_fn


def make_sharded_train_step(
    renderer: Any,
    loss_functions: Sequence[Any],
    calib: Any,
    mesh: Mesh,
    tx: Any,
    batch_size: int,
    image_height: int,
    image_width: int,
    grad_accum: int = 1,
) -> Any:
    """Library-level jit-compiled training step over the mesh.

    Thin composition of the canonical step implementation
    (``training.step.make_local_grads``) with ``make_sharded_grads`` —
    the PRODUCT path is ``NeRFTrainer`` with a ``mesh`` config, which
    uses the same two pieces plus grad_accum / camera optimization /
    loss_dict logging / checkpoint plumbing.

    Returns step(params, opt_state, camera_deltas, rgb_images,
    mask_images, camera_initials, key, camera_id, iteration) ->
    (params, opt_state, loss, mse).
    """
    from neddf_tpu.training.step import make_local_grads

    n_model = mesh.shape["model"]
    local_grads = make_local_grads(
        tp_renderer(renderer) if n_model > 1 else renderer,
        loss_functions, calib, image_width, image_height, batch_size,
        grad_accum=grad_accum,
    )
    grads_fn = make_sharded_grads(mesh, local_grads, batch_size)

    def train_step(params, opt_state, camera_deltas, rgb_images,
                   mask_images, camera_initials, key, camera_id, iteration):
        loss, _, mse, grads, _ = grads_fn(
            params, camera_deltas, rgb_images, mask_images,
            camera_initials, key, camera_id, iteration,
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, mse

    return jax.jit(train_step, donate_argnums=(0, 1))


def make_sharded_render(renderer: Any, calib: Any, mesh: Mesh) -> Any:
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
        # shard_map DP render: pixel rows shard over the whole mesh and
        # each device runs the ORDINARY single-device program (incl.
        # fused Pallas kernels — GSPMD can't partition a custom call,
        # so a with_sharding_constraint route would gather the batch
        # around every kernel on real multi-chip hardware)
        n_total = mesh.devices.size

        def per_device(params, pose_r, pose_t, uv_local, key):
            out = renderer.render_rays(
                params, calib, pose_r, pose_t, uv_local, key, -1,
                need_aux=False,
            )
            return {
                k: v for k, v in out.items()
                if k in ("color", "depth", "transmittance")
            }

        def render(params, pose_r, pose_t, uv, key):
            if uv.shape[0] % n_total:
                raise ValueError(
                    f"uv rows {uv.shape[0]} not divisible by {n_total} devices"
                )
            out = jax.shard_map(
                per_device,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(("data", "model")), P()),
                out_specs=P(("data", "model")),
                check_vma=False,
            )(params, pose_r, pose_t, uv, key)
            return {
                k: jax.lax.with_sharding_constraint(v, replicated(mesh))
                for k, v in out.items()
            }

        return jax.jit(render)

    tp_r = tp_renderer(renderer)
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
