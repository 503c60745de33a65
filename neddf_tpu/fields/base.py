"""Field API: static-config classes + pure init/apply functions.

The reference's nn.Module fields (neddf/network/*) mutate warmup state
via ``set_iter`` (neddf/network/neddf.py:311-326). Here every field is a
frozen dataclass of *static* hyperparameters with

    params   = field.init(key)                     # parameter pytree
    outputs  = field.apply(params, sampling, sched)  # pure, jit-safe

and warmups are explicit traced scalars in a ``Schedule`` pytree produced
by ``field.schedule(iteration)`` (iteration == -1 selects eval values,
branchlessly, so train/eval share one compiled program per shape).

Parameter pytrees mirror the reference's state_dict tree (layers_ddf.0.*
etc.) so the torch ``.pth`` checkpoint importer is a key-by-key walk;
weights are stored [in, out] (transposed from torch's [out, in]).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neddf_tpu.geometry.rays import Sampling

Array = jax.Array
Params = Any


class Schedule(NamedTuple):
    """Traced warmup scalars (see NeDDF.set_iter / NeRF.set_iter)."""

    lowpass_alpha: Array
    aux_grad_scale: Array
    distance_range_max: Array


def linear_init_xavier_normal(
    key: Array, fan_in: int, fan_out: int
) -> Dict[str, Array]:
    """Xavier-normal weight + zero bias, matching LinearGradLayer.reset_parameters
    (neddf/nn_module/with_grad/linear.py:113-116)."""
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    w = std * jax.random.normal(key, (fan_in, fan_out), dtype=jnp.float32)
    return {"w": w, "b": jnp.zeros((fan_out,), dtype=jnp.float32)}


def linear_init_torch_default(
    key: Array, fan_in: int, fan_out: int
) -> Dict[str, Array]:
    """PyTorch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == both
    weight and bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Used by the
    plain layers in NeRF/NeuS."""
    kw, kb = jax.random.split(key)
    bound = float(1.0 / np.sqrt(fan_in))
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def linear_apply(p: Dict[str, Array], x: Array) -> Array:
    return x @ p["w"] + p["b"]


def tp_gather(h: Array, tp_axis: Optional[str], full_width: int) -> Array:
    """Reassemble a width shard under shard_map tensor parallelism.

    With a field's ``tp_axis`` set, its trunk weights are column-sharded
    over that mesh axis (parallel/mesh.py::shard_field_params) and each
    device computes a [.., W/n] activation slice; this all-gathers the
    slices back to full width so the next layer (and the replicated
    heads) see the reference math unchanged. The explicit collective is
    what lets TP bypass the GSPMD SPMD partitioner entirely — see the
    partitioner-miscompile note in parallel/mesh.py.

    No-op when tp_axis is None or the activation is already full width
    (replicated-weight layers such as the 1/3-wide heads).
    """
    if tp_axis is None or h.shape[-1] >= full_width:
        return h
    return jax.lax.all_gather(h, tp_axis, axis=h.ndim - 1, tiled=True)


class BaseField:
    """Static-config mixin; subclasses are frozen dataclasses."""

    def init(self, key: Array) -> Params:
        raise NotImplementedError

    def apply(
        self,
        params: Params,
        sampling: Sampling,
        sched: Schedule,
        *,
        need_aux: bool = True,
    ) -> Dict[str, Array]:
        """Evaluate the field at ``sampling``.

        need_aux=False is the EVAL fast path: outputs whose only
        consumers are training penalties (e.g. NeDDF's color-branch
        Jacobian feeding constraints_color) may be skipped and the
        ``fields_penalty`` entry returned as zeros. Fields without such
        outputs ignore the flag.
        """
        raise NotImplementedError

    def schedule(self, iteration: "Array | int") -> Schedule:
        """Default: no warmups (NeuS). iteration may be a traced scalar."""
        del iteration
        one = jnp.float32(1.0)
        return Schedule(
            lowpass_alpha=jnp.float32(1e9),
            aux_grad_scale=one,
            distance_range_max=jnp.float32(2.0),
        )


def voxelize(
    field: BaseField,
    params: Params,
    field_name: str = "density",
    cube_range: float = 1.1,
    cube_resolution: int = 64,
    chunk: int = 65536,
) -> np.ndarray:
    """Chunked grid query of one output field over a cubic lattice.

    Reproduces BaseNeuralField.voxelize (neddf/network/base_neuralfield.py:
    49-79) including its np.meshgrid('xy') axis ordering so exported
    volumes are bit-compatible with the reference's mesh cache files.
    """
    ids = np.linspace(-cube_range, cube_range, cube_resolution)
    zs, ys, xs = np.meshgrid(ids, ids, ids)
    pos = np.stack([xs.reshape(-1), ys.reshape(-1), zs.reshape(-1)], axis=1).astype(
        np.float32
    )
    n = pos.shape[0]
    direction = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))

    sched = field.schedule(-1)
    # eval fast path, except when the requested field IS a penalty
    need_aux = "penalty" in field_name
    apply_fn = jax.jit(
        lambda p, s: field.apply(p, s, sched, need_aux=need_aux)[field_name]
    )
    out = np.zeros(n, np.float32)
    for i in range(0, n, chunk):
        j = min(n, i + chunk)
        # pad to the chunk size so only one program is compiled
        pad = chunk - (j - i)
        pos_c = np.pad(pos[i:j], ((0, pad), (0, 0)))
        dir_c = np.pad(direction[i:j], ((0, pad), (0, 0)))
        sampling = Sampling(
            sample_pos=jnp.asarray(pos_c)[None],
            sample_dir=jnp.asarray(dir_c)[None],
            diag_variance=jnp.zeros((1, chunk, 3), jnp.float32),
        )
        val = np.asarray(apply_fn(params, sampling)).reshape(-1)
        out[i:j] = val[: j - i]
    return out.reshape(cube_resolution, cube_resolution, cube_resolution)
