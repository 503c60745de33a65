"""NeuS: SDF field with logistic-density conversion.

Behavioural twin of neddf/network/neus.py:30-162. The reference obtains
surface normals via reverse-mode ``torch.autograd.grad(create_graph=True)``
(neus.py:133-142); here that is ``jax.value_and_grad`` over the sdf sum
(valid because each sample's sdf depends only on its own position), which
stays differentiable for the outer training loss.

Reference quirks preserved:

* sdf is the FIRST CHANNEL of the activated trunk features, not a
  separate head (neus.py:130).
* the color branch applies the activation after EVERY layer including
  the final 3-channel one (neus.py:148-150).
* density = 10 s * e / (1 + e)^2 with e = exp(-10 s * sdf) and trainable
  scalar s (init_variance), neus.py:152-155.
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
from neddf_tpu.ops.pe import positional_encoding_mip

Array = jax.Array


@dataclass(frozen=True)
class NeuS(BaseField):
    embed_pos_rank: int = 6
    embed_dir_rank: int = 4
    sdf_layer_count: int = 8
    sdf_layer_width: int = 256
    col_layer_count: int = 8
    col_layer_width: int = 256
    activation_type: str = "ReLU"
    init_variance: float = 0.3
    skips: Tuple[int, ...] = (4,)
    # fused Pallas kernel for the color branch ("auto" = TPU).
    fused: str = "auto"
    # normals = d(sdf)/d(xyz):
    #   "reverse" (default, and what "auto" resolves to) —
    #     jax.value_and_grad through the trunk, the reference's
    #     formulation (torch.autograd.grad, neus.py:133-142); the outer
    #     loss differentiates again (reverse-over-reverse).
    #   "dual" — forward-mode via the fused dual-Jacobian Pallas trunk
    #     (kernels/dual_mlp.py). Verified exactly equivalent (values and
    #     second-order grads, tests/fields/test_neus_dual_normals.py)
    #     but MEASURED 2.2x SLOWER on v5e (48.9 vs 22.0 ms/step):
    #     NeuS only needs ONE output channel's gradient, so one reverse
    #     pass beats carrying 3 tangent streams for all 256 channels.
    #     (NeDDF is the opposite case: it consumes the FULL feature
    #     Jacobian, where forward-mode wins.) Kept as a documented,
    #     tested alternative — mode choice is per-field, not global.
    #   "sweep" — the fused reverse-sweep kernel (kernels/sdf_mlp.py):
    #     trunk + the single-channel reverse pass VMEM-resident with a
    #     hand-written second-order VJP — the right transposition AND
    #     fused. Exactly equivalent (tests/fields/test_neus_dual_normals
    #     .py + tests/kernels/test_sdf_mlp.py) and MEASURED 1.38x the
    #     reverse path on v5e (full NeuS train step 15.32 vs 21.1 ms =
    #     33.4k vs 24.2k rays/s, identical loss; same-session A/B
    #     2026-08-18, tools/ab_flagship.py neus_normals reverse sweep).
    #   "auto" (default) — sweep on TPU, reverse elsewhere (the kernel
    #     only interprets off-TPU, like fused="auto").
    normals: str = "auto"
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
        return jax.default_backend() == "tpu"

    def _use_dual_normals(self) -> bool:
        if self.tp_axis is not None:
            # TP requires the jnp reverse-mode trunk (no Pallas calls)
            return False
        if self.normals == "dual":
            return True
        if self.normals in ("reverse", "sweep"):
            return False
        if self.normals != "auto":
            raise ValueError(f"unknown normals mode {self.normals!r}")
        return False

    def _use_sweep_normals(self) -> bool:
        if self.tp_axis is not None:
            return False
        if self.normals == "sweep":
            return True
        # auto = the fused sweep kernel on TPU (measured 1.38x reverse,
        # see the ``normals`` field comment), reverse-mode elsewhere.
        return self.normals == "auto" and jax.default_backend() == "tpu"

    def _trunk_sweep(self, params, pos: Array):
        """SDF trunk + channel-0 gradient via the fused reverse-sweep
        kernel (kernels/sdf_mlp.py): the trunk and its single-channel
        reverse pass run VMEM-resident, with a hand-written second-order
        VJP; normals chain from PE channels to positions with the
        channel-sparse contraction (ops/sdf_grad.py::pe_chain_to_pos).
        Measured 1.38x the reverse-mode path on v5e (see
        kernels/sdf_mlp.py STATUS)."""
        from neddf_tpu.kernels.dual_mlp import pad_rows
        from neddf_tpu.kernels.sdf_mlp import TILE_M, sdf_mlp
        from neddf_tpu.ops.sdf_grad import pe_chain_to_pos

        embed_pos = positional_encoding_mip(pos, self.embed_pos_rank)
        w_hidden = self.sdf_layer_width
        weights, biases, layout = [], [], []
        for li, layer in enumerate(params["layers_sdf"]):
            w = layer["w"]
            split = (li - 1) in self.skips
            # kernel layout is [hidden, embed] — same as our trunk's
            # concat order (neus.py:135-137), so rows pass through
            weights.append(w)
            biases.append(layer["b"])
            layout.append(split)
        interp = jax.default_backend() != "tpu"

        e0, m = pad_rows(embed_pos, TILE_M)

        def call(lo, hi):
            return sdf_mlp(
                e0[lo:hi], tuple(weights), tuple(biases), tuple(layout),
                self.activation_type, "float32", interp,
            )

        cap = self._KERNEL_ROW_CAP
        mp = e0.shape[0]
        if mp <= cap:
            h, gE = call(0, mp)
        else:
            outs = [call(lo, min(lo + cap, mp)) for lo in range(0, mp, cap)]
            h = jnp.concatenate([o[0] for o in outs], axis=0)
            gE = jnp.concatenate([o[1] for o in outs], axis=0)
        sdf_feature = h[:m]
        gradients = pe_chain_to_pos(gE[:m], pos, self.embed_pos_rank)
        return sdf_feature, gradients

    @property
    def input_sdf_dim(self) -> int:
        return self.embed_pos_rank * 6

    @property
    def input_col_dim(self) -> int:
        return 6 + self.embed_dir_rank * 6 + self.sdf_layer_width

    def init(self, key: Array) -> Dict[str, Array]:
        n_sdf = self.sdf_layer_count  # 1 + (count-1)
        n_col = self.col_layer_count + 1  # 1 + (count-1) + final 3-ch
        keys = jax.random.split(key, n_sdf + n_col)
        w, cw = self.sdf_layer_width, self.col_layer_width

        layers_sdf = [linear_init_torch_default(keys[0], self.input_sdf_dim, w)]
        for layer_id in range(self.sdf_layer_count - 1):
            fan_in = w + self.input_sdf_dim if layer_id in self.skips else w
            layers_sdf.append(linear_init_torch_default(keys[1 + layer_id], fan_in, w))

        layers_col = [linear_init_torch_default(keys[n_sdf], self.input_col_dim, cw)]
        for i in range(self.col_layer_count - 1):
            layers_col.append(linear_init_torch_default(keys[n_sdf + 1 + i], cw, cw))
        layers_col.append(linear_init_torch_default(keys[-1], cw, 3))

        return {
            "layers_sdf": layers_sdf,
            "layers_col": layers_col,
            "variance": jnp.float32(self.init_variance),
        }

    # per-kernel-call row cap — same verified regime as NeDDF
    # (fields/neddf.py::_KERNEL_ROW_CAP, kernels/dual_mlp.py docstring)
    _KERNEL_ROW_CAP = 393216

    def _trunk_dual(self, params, pos: Array):
        """SDF trunk + exact spatial gradient via the fused dual kernel.

        The NeuS skip concat is ``[hx, embed]`` (hidden FIRST,
        neus.py:135-137) while the kernel's split layer consumes
        ``[segment0, hidden]`` — the post-skip layer's weight ROWS are
        swapped at call time to compensate (pure relabeling).
        """
        from neddf_tpu.kernels.dual_mlp import dual_mlp_seg, pad_rows
        from neddf_tpu.ops.dual import pe_dual_planes

        emb_v, emb_j = pe_dual_planes(pos, self.embed_pos_rank)
        w_hidden = self.sdf_layer_width
        weights, biases = [], []
        layout = []
        for li, layer in enumerate(params["layers_sdf"]):
            w = layer["w"]
            split = (li - 1) in self.skips
            if split:
                w = jnp.concatenate([w[w_hidden:], w[:w_hidden]], axis=0)
            weights.append(w)
            biases.append(layer["b"])
            layout.append(split)
        interp = jax.default_backend() != "tpu"

        v0, m = pad_rows(emb_v)
        j0, _ = pad_rows(emb_j, axis=1)

        def call(lo, hi):
            return dual_mlp_seg(
                (v0[lo:hi],), (j0[:, lo:hi],), tuple(weights), tuple(biases),
                tuple(layout), self.activation_type, (True,), "float32",
                interp,
            )

        cap = self._KERNEL_ROW_CAP
        mp = v0.shape[0]
        if mp <= cap:
            v, j = call(0, mp)
        else:
            outs = [call(lo, min(lo + cap, mp)) for lo in range(0, mp, cap)]
            v = jnp.concatenate([o[0] for o in outs], axis=0)
            j = jnp.concatenate([o[1] for o in outs], axis=1)
        sdf_feature = v[:m]
        gradients = jnp.moveaxis(j[:, :m, 0], 0, 1)  # [M, 3] = d sdf/d xyz
        return sdf_feature, gradients

    def apply(
        self,
        params: Dict[str, Array],
        sampling: Sampling,
        sched: Schedule,
        *,
        need_aux: bool = True,
    ) -> Dict[str, Array]:
        del need_aux  # NeuS has no penalty-only outputs
        del sched  # NeuS has no warmups in the reference
        batch_size, sampling_size = sampling.sample_pos.shape[:2]
        act, _ = ACTIVATIONS[self.activation_type]

        pos = sampling.sample_pos.reshape(-1, 3)
        direction = sampling.sample_dir.reshape(-1, 3)

        if self._use_dual_normals():
            sdf_feature, gradients = self._trunk_dual(params, pos)
        elif self._use_sweep_normals():
            sdf_feature, gradients = self._trunk_sweep(params, pos)
        else:
            def trunk(p: Array) -> Array:
                embed_pos = positional_encoding_mip(p, self.embed_pos_rank)
                hx = embed_pos
                for layer_id, layer in enumerate(params["layers_sdf"]):
                    hx = act(linear_apply(layer, hx))
                    hx = tp_gather(hx, self.tp_axis, self.sdf_layer_width)
                    if layer_id in self.skips:
                        hx = jnp.concatenate([hx, embed_pos], axis=1)
                return hx

            def sdf_sum(p: Array):
                hx = trunk(p)
                return jnp.sum(hx[:, 0]), hx

            (_, sdf_feature), gradients = jax.value_and_grad(
                sdf_sum, has_aux=True
            )(pos)
            if self.tp_axis is not None:
                # Under shard_map TP each device's reverse pass only
                # accumulates the paths through ITS weight columns, times
                # n (grad-inside-shard_map sums the per-device seeds);
                # psum over the width shards / n reassembles the exact
                # full-network normal on every device.
                n = jax.lax.axis_size(self.tp_axis)
                gradients = jax.lax.psum(gradients, self.tp_axis) / n
        sdf = sdf_feature[:, :1]

        embed_dir = positional_encoding_mip(direction, self.embed_dir_rank)
        if self._use_fused():
            from neddf_tpu.kernels.dual_mlp import pad_rows
            from neddf_tpu.kernels.mlp import TILE_M, mlp_seg

            segs = (pos, embed_dir, gradients, sdf_feature)
            padded = [pad_rows(s, TILE_M) for s in segs]
            m = pos.shape[0]
            color = mlp_seg(
                tuple(p for p, _ in padded),
                tuple(l["w"] for l in params["layers_col"]),
                tuple(l["b"] for l in params["layers_col"]),
                (False,) * len(params["layers_col"]),
                self.activation_type,
                "float32",
                jax.default_backend() != "tpu",
            )[:m]
        else:
            hx = jnp.concatenate([pos, embed_dir, gradients, sdf_feature], axis=1)
            n_col = len(params["layers_col"])
            for i, layer in enumerate(params["layers_col"]):
                hx = act(linear_apply(layer, hx))
                # final layer is the (replicated) 3-channel output
                if i < n_col - 1:
                    hx = tp_gather(hx, self.tp_axis, self.col_layer_width)
            color = hx

        s10 = params["variance"] * 10.0
        ex = jnp.exp(-s10 * sdf)
        density = s10 * ex / jnp.square(1.0 + ex)

        return {
            "sdf": sdf.reshape(batch_size, sampling_size),
            "density": density.reshape(batch_size, sampling_size),
            "color": color.reshape(batch_size, sampling_size, 3),
        }
