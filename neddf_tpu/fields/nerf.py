"""NeRF radiance field (plain MLP, no spatial Jacobian).

Behavioural twin of neddf/network/nerf.py:34-178 with the reference's
quirks preserved:

* skip concat order is ``[hx, embed_pos]`` (the OPPOSITE of NeDDF's),
  nerf.py:152-155.
* trunk has ``layer_count`` linears (1 + (layer_count-1)); the layer
  AFTER skip index 4 takes width+input_pos_dim inputs.
* no sigmoid on color / relu applied via density_activation only;
  color head is Linear -> ReLU -> Linear (nerf.py:99-103).
* PE of position is scaled by lowpass * mip pe_weights; PE of direction
  is unscaled.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from neddf_tpu.fields.base import (
    BaseField,
    Schedule,
    linear_apply,
    linear_init_torch_default,
    tp_gather,
)
from neddf_tpu.geometry.rays import Sampling
from neddf_tpu.ops.activations import ACTIVATIONS
from neddf_tpu.ops.pe import pe_lowpass_scale, positional_encoding_mip

Array = jax.Array


@dataclass(frozen=True)
class NeRF(BaseField):
    embed_pos_rank: int = 10
    embed_dir_rank: int = 4
    layer_count: int = 8
    layer_width: int = 256
    activation_type: str = "ReLU"
    density_activation_type: str = "ReLU"
    lowpass_alpha_offset: float = 10.0
    # coarse-to-fine PE ramp per iteration (reference hardcodes 1e-3);
    # see NeDDF.lowpass_alpha_rate for the BARF-style annealing use
    lowpass_alpha_rate: float = 0.001
    skips: Tuple[int, ...] = (4,)
    # bfloat16 halves trunk-activation HBM traffic on TPU (f32 MXU
    # accumulation either way); heads return f32
    compute_dtype: str = "float32"
    # fused Pallas trunk (kernels/mlp.py): "auto" = TPU only
    fused: str = "auto"
    # shard_map tensor parallelism (see fields/base.py::tp_gather)
    tp_axis: Optional[str] = None

    def __post_init__(self):
        object.__setattr__(self, "skips", tuple(self.skips))

    def _use_fused(self) -> bool:
        if self.tp_axis is not None:
            return False
        if self.fused == "on":
            return True
        if self.fused == "off":
            return False
        ok_skips = all(s < self.layer_count - 1 for s in self.skips)
        return ok_skips and jax.default_backend() == "tpu"

    def _trunk_fused(self, params, embed_pos):
        from neddf_tpu.kernels.dual_mlp import pad_rows
        from neddf_tpu.kernels.mlp import TILE_M, mlp_seg

        weights = tuple(l["w"] for l in params["layers"])
        biases = tuple(l["b"] for l in params["layers"])
        layout = tuple((li - 1) in self.skips for li in range(len(weights)))
        out_dtype = (
            "bfloat16" if jnp.dtype(self.compute_dtype) != jnp.float32 else "float32"
        )
        interp = jax.default_backend() != "tpu"
        v0, m = pad_rows(embed_pos, TILE_M)
        hx = mlp_seg(
            (v0,), weights, biases, layout, self.activation_type,
            out_dtype, interp,
        )
        return hx[:m]

    @property
    def input_pos_dim(self) -> int:
        return self.embed_pos_rank * 6

    @property
    def input_dir_dim(self) -> int:
        return self.embed_dir_rank * 6

    def init(self, key: Array) -> Dict[str, Array]:
        keys = jax.random.split(key, self.layer_count + 3)
        width = self.layer_width
        layers = [linear_init_torch_default(keys[0], self.input_pos_dim, width)]
        for layer_id in range(self.layer_count - 1):
            fan_in = width + self.input_pos_dim if layer_id in self.skips else width
            layers.append(linear_init_torch_default(keys[1 + layer_id], fan_in, width))
        return {
            "layers": layers,
            "outL_density": linear_init_torch_default(keys[-3], width, 1),
            "outL_color": [
                linear_init_torch_default(
                    keys[-2], width + self.input_dir_dim, width // 2
                ),
                linear_init_torch_default(keys[-1], width // 2, 3),
            ],
        }

    def schedule(self, iteration: "Array | int") -> Schedule:
        it = jnp.asarray(iteration, jnp.float32)
        alpha = jnp.where(
            it < 0,
            jnp.float32(self.embed_pos_rank),
            self.lowpass_alpha_offset + self.lowpass_alpha_rate * it,
        )
        return Schedule(
            lowpass_alpha=alpha,
            aux_grad_scale=jnp.float32(1.0),
            distance_range_max=jnp.float32(2.0),
        )

    def apply(
        self,
        params: Dict[str, Array],
        sampling: Sampling,
        sched: Schedule,
        *,
        need_aux: bool = True,
    ) -> Dict[str, Array]:
        del need_aux  # NeRF has no penalty-only outputs
        batch_size, sampling_size = sampling.sample_pos.shape[:2]
        act, _ = ACTIVATIONS[self.activation_type]
        density_act, _ = ACTIVATIONS[self.density_activation_type]

        pos = sampling.sample_pos.reshape(-1, 3)
        direction = sampling.sample_dir.reshape(-1, 3)
        var = sampling.diag_variance.reshape(-1, 3)

        lowpass = pe_lowpass_scale(self.embed_pos_rank, sched.lowpass_alpha)
        # lane-packed PE (ops/pe.py): bitwise-equal to
        # positional_encoding(pos, rank, lowpass * pe_weights(var, rank))
        embed_pos = positional_encoding_mip(
            pos, self.embed_pos_rank, var=var, chan_scale=lowpass
        )
        embed_dir = positional_encoding_mip(direction, self.embed_dir_rank)

        cd = jnp.dtype(self.compute_dtype)
        cast = (lambda t: t.astype(cd)) if cd != jnp.float32 else (lambda t: t)
        cast_p = lambda l: {"w": cast(l["w"]), "b": cast(l["b"])}
        if self._use_fused():
            hx = self._trunk_fused(params, cast(embed_pos))
        else:
            hx = cast(embed_pos)
            for layer_id, layer in enumerate(params["layers"]):
                hx = act(linear_apply(cast_p(layer), hx))
                hx = tp_gather(hx, self.tp_axis, self.layer_width)
                if layer_id in self.skips:
                    hx = jnp.concatenate([hx, cast(embed_pos)], axis=1)
        density = density_act(
            linear_apply(cast_p(params["outL_density"]), hx).astype(jnp.float32)
        )

        h = jnp.concatenate([hx, cast(embed_dir)], axis=1)
        h = jax.nn.relu(linear_apply(cast_p(params["outL_color"][0]), h))
        h = tp_gather(h, self.tp_axis, self.layer_width // 2)
        color = linear_apply(cast_p(params["outL_color"][1]), h).astype(jnp.float32)

        return {
            "density": density.reshape(batch_size, sampling_size),
            "color": color.reshape(batch_size, sampling_size, 3),
        }
