"""NeDDF: Neural Density-Distance Field with analytic spatial Jacobians.

Behavioural twin of neddf/network/neddf.py:52-326 (the paper model,
arXiv:2207.14455), rebuilt on the dense dual tensor from
neddf_tpu.ops.dual instead of the reference's hand-written autograd
Functions. Parity-critical details preserved:

* DDF trunk input PE is scaled by grad_scale * lowpass * pe_weights;
  the color branch PE omits grad_scale (neddf.py:200-209).
* skip concat order [embed, hx] (neddf.py:214-219) — opposite of NeRF.
* distance = softplus(head) + d_near; density = density_act(
  (1/D) * (1 - ||[grad D, aux]||)) (neddf.py:220-240).
* aux head: sigmoid scaled by the aux_grad_scale warmup.
* color branch consumes [PE(pos), PE(dir), stop_grad(normalized grad D),
  features] (neddf.py:243-257). Where the reference carries the FULL
  3-plane color Jacobian only to contract it with sg(grad D) inside
  constraints_color (neddf.py:263-265), this implementation contracts
  at the SEED and propagates a single directional tangent (K=1 JVP
  along sg(grad D)) — identical math (the tangent path is linear; see
  tests/fields/test_neddf_directional_color.py for the value+grad
  equivalence proof), half the color-trunk streams.
* six field-constraint penalties with the reference's stop_gradient
  placements and its quirk that a penalty key missing from
  penalty_weight enters the sum UNWEIGHTED (neddf.py:296-300).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from neddf_tpu.fields.base import (
    BaseField,
    Schedule,
    linear_init_xavier_normal,
    tp_gather,
)
from neddf_tpu.geometry.rays import Sampling
from neddf_tpu.ops.activations import (
    ACTIVATIONS,
    relu,
    sigmoid,
    sigmoid_deriv,
    softplus,
    softplus_deriv,
)
from neddf_tpu.ops.dual import (
    act_dual,
    dual_jacobian,
    dual_value,
    linear_dual,
    pe_dual,
    pe_dual_directional_mip,
)
from neddf_tpu.ops.pe import (
    pe_grad_scale,
    pe_lowpass_scale,
    pe_weights,
    positional_encoding_mip,
)

Array = jax.Array

_DEFAULT_PENALTY_WEIGHT = {
    "constraints_aux_grad": 0.05,
    "constraints_dDdt": 0.05,
    "constraints_color": 0.01,
    "range_distance": 1.0,
    "range_aux_grad": 1.0,
}

# Fused head/density/penalty epilogue kernel for the training path
# (kernels/neddf_epilogue.py). TRACE-TIME flag (see bwd_stash): A/B
# benches must build fresh jits per setting.
_EPILOGUE = [True]

# Where the positional encoding is expanded: "trunk" fuses the DDF
# trunk's PE-with-grad into the dual-MLP kernel (raw pos/var in,
# kernels/dual_mlp.py in-kernel PE), "both" additionally fuses the
# color branch's directional PE + PE(dir), "off" builds every encoding
# in XLA (ops/dual.py) and feeds expanded arrays. TRACE-TIME flag.
#
# MEASURED NEGATIVE RESULT (v5e-1 flagship, same-session A/B 2026-08-17,
# do not re-default without re-measuring): off / trunk / both =
# 19.5 / 20.6 / 21.5 ms per step. In-kernel expansion LOSES even though
# it deletes ~1.8 ms of XLA-side PE glue: inside the kernel every
# elementwise op on the narrow [T,30]/[T,60] intermediates occupies
# full 128-lane vregs (~64 vregs per op at T=512 regardless of width),
# the expansion runs twice (fwd + bwd re-expand), and the bwd adds the
# ~40-op PE cotangent chain — ~5 us/tile against the ~2 us the XLA
# fusions amortise to. The capability stays (verified bitwise vs the
# XLA path in tests/kernels/test_dual_mlp_pe.py) for shapes/hardware
# where the trade flips.
_PE_IN_KERNEL = ["off"]


class pe_in_kernel:
    """Context manager for the PE-fusion mode (A/B benches)."""

    def __init__(self, mode: str):
        assert mode in ("both", "trunk", "off")
        self.mode = mode

    def __enter__(self):
        self.prev = _PE_IN_KERNEL[0]
        _PE_IN_KERNEL[0] = self.mode
        return self

    def __exit__(self, *exc):
        _PE_IN_KERNEL[0] = self.prev


class use_epilogue:
    """Context manager toggling the fused epilogue kernel (A/B)."""

    def __init__(self, on: bool):
        self.on = on

    def __enter__(self):
        self.prev = _EPILOGUE[0]
        _EPILOGUE[0] = self.on

    def __exit__(self, *exc):
        _EPILOGUE[0] = self.prev


@dataclass(frozen=True)
class NeDDF(BaseField):
    embed_pos_rank: int = 10
    embed_dir_rank: int = 4
    ddf_layer_count: int = 8
    ddf_layer_width: int = 256
    col_layer_count: int = 8
    col_layer_width: int = 256
    activation_type: str = "tanhExp"
    density_activation_type: str = "ReLU"
    d_near: float = 0.01
    lowpass_alpha_offset: float = 10.0
    # per-iteration ramp of the coarse-to-fine PE window (reference
    # hardcodes 1e-3: neddf.py:311-326). Configurable for BARF-style
    # slow frequency annealing during joint pose+field refinement
    # (offset < rank + a slower rate keeps the photometric landscape
    # smooth while poses converge).
    lowpass_alpha_rate: float = 0.001
    skips: Tuple[int, ...] = (4,)
    penalty_weight: Optional[Tuple[Tuple[str, float], ...]] = None
    # dtype for the MLP trunks' stored activations/weights. bfloat16 halves
    # the HBM activation traffic that dominates the step time on TPU (the
    # MXU accumulates in f32 either way); the density equation, heads and
    # penalties always run in f32. Default float32 for bit-parity with the
    # reference; production TPU configs (config/network/neddf.yaml) set
    # bfloat16.
    compute_dtype: str = "float32"
    # fused Pallas trunk kernel: "auto" uses it on TPU only (the jnp dual
    # path runs everywhere else, incl. the CPU test mesh); "on"/"off"
    # force it. The kernel keeps all trunk activations in VMEM (fwd AND
    # bwd via recompute) — see neddf_tpu/kernels/dual_mlp.py.
    fused: str = "auto"
    # shard_map tensor parallelism: when set to a mesh axis name, trunk
    # weights are column-sharded over that axis and each jnp-path layer
    # all-gathers its activation slice (fields/base.py::tp_gather). Set
    # by parallel/mesh.py's TP train step; disables the fused kernels
    # (a Pallas call can't consume width shards).
    tp_axis: Optional[str] = None

    def __post_init__(self):
        object.__setattr__(self, "skips", tuple(self.skips))
        pw = self.penalty_weight
        if pw is None:
            pw = _DEFAULT_PENALTY_WEIGHT
        if isinstance(pw, dict):
            pw = tuple(sorted(pw.items()))
        object.__setattr__(self, "penalty_weight", tuple(pw))

    @property
    def input_ddf_dim(self) -> int:
        return self.embed_pos_rank * 6

    @property
    def input_col_dim(self) -> int:
        return (
            (self.embed_pos_rank + self.embed_dir_rank) * 6
            + 3
            + self.ddf_layer_width
        )

    def init(self, key: Array) -> Dict[str, Array]:
        n_ddf = self.ddf_layer_count - 1
        n_col = self.col_layer_count - 1
        keys = jax.random.split(key, n_ddf + n_col + 3)
        w, cw = self.ddf_layer_width, self.col_layer_width

        layers_ddf = [linear_init_xavier_normal(keys[0], self.input_ddf_dim, w)]
        for layer_id in range(self.ddf_layer_count - 2):
            fan_in = w + self.input_ddf_dim if layer_id in self.skips else w
            layers_ddf.append(linear_init_xavier_normal(keys[1 + layer_id], fan_in, w))

        layers_col = [linear_init_xavier_normal(keys[n_ddf], self.input_col_dim, cw)]
        for i in range(self.col_layer_count - 2):
            layers_col.append(linear_init_xavier_normal(keys[n_ddf + 1 + i], cw, cw))

        return {
            "layers_ddf": layers_ddf,
            "layers_col": layers_col,
            "layer_ddf_out": linear_init_xavier_normal(keys[-3], w, 1),
            "layer_aux_out": linear_init_xavier_normal(keys[-2], w, 1),
            "layer_col_out": linear_init_xavier_normal(keys[-1], cw, 3),
        }

    def schedule(self, iteration: "Array | int") -> Schedule:
        """Warmups from NeDDF.set_iter (neddf.py:311-326); iteration == -1
        (or any negative) selects eval values."""
        it = jnp.asarray(iteration, jnp.float32)
        is_eval = it < 0
        return Schedule(
            lowpass_alpha=jnp.where(
                is_eval,
                jnp.float32(self.embed_pos_rank),
                self.lowpass_alpha_offset + self.lowpass_alpha_rate * it,
            ),
            aux_grad_scale=jnp.where(
                is_eval, jnp.float32(1.1), jnp.clip(0.0001 * it, 0.01, 1.1)
            ),
            distance_range_max=jnp.where(
                is_eval, jnp.float32(2.0), jnp.minimum(2.0, 2.0 + 0.0001 * it)
            ),
        )

    def _use_fused(self) -> bool:
        if self.tp_axis is not None:
            return False
        if self.fused == "on":
            return True
        if self.fused == "off":
            return False
        # trailing skip concat is not expressible as a split weight
        ok_skips = all(s < self.ddf_layer_count - 2 for s in self.skips)
        return ok_skips and jax.default_backend() == "tpu"

    def _kernel_out_dtype(self) -> str:
        return "bfloat16" if jnp.dtype(self.compute_dtype) != jnp.float32 else "float32"

    # per-kernel-call row cap: programs containing the kernels' grad at
    # M ~ 8e5 rows miscompile on current v5e toolchains (see
    # kernels/dual_mlp.py docstring); splitting into <= CAP row calls
    # keeps every invocation in the verified regime
    _KERNEL_ROW_CAP = 393216  # 256 * 1536, verified clean

    @staticmethod
    def _chunked_kernel(call, m: int, cap: int):
        """Run ``call(lo, hi)`` over row chunks and concat (static loop)."""
        if m <= cap:
            return call(0, m)
        outs = [call(lo, min(lo + cap, m)) for lo in range(0, m, cap)]
        vs = jnp.concatenate([o[0] for o in outs], axis=0)
        js = jnp.concatenate([o[1] for o in outs], axis=1)
        return vs, js

    def _trunk_fused_planes(self, params, pos: Array, var: Array, crow: Array):
        """DDF trunk through the fused Pallas kernel, planes out.

        The PE-with-grad input is expanded INSIDE the kernel from the
        raw positions, mip variance and the grad_scale*lowpass row
        (kernels/dual_mlp.py in-kernel PE): the XLA-side PE chain at
        the flagship shapes was ~2 ms/step of lane-padded [M,30]/[M,60]
        fusions and layout copies."""
        from neddf_tpu.kernels.dual_mlp import dual_mlp_seg, pad_rows

        weights = tuple(l["w"] for l in params["layers_ddf"])
        biases = tuple(l["b"] for l in params["layers_ddf"])
        # the reference concats AFTER layer s (neddf.py:214-219), so layer
        # s+1 consumes [embed, h] -> mark it as the split layer
        layout = tuple((li - 1) in self.skips for li in range(len(weights)))
        interp = jax.default_backend() != "tpu"  # CPU tests: interpreter

        if _PE_IN_KERNEL[0] in ("both", "trunk"):
            v0, m = pad_rows(pos)
            var_p, _ = pad_rows(var)
            pe = (("id", self.embed_pos_rank, True, True),)

            def call(lo, hi):
                return dual_mlp_seg(
                    (v0[lo:hi],), (), weights, biases, layout,
                    self.activation_type, (True,), self._kernel_out_dtype(),
                    interp, pe_aux=(crow, var_p[lo:hi]), pe=pe, n_tan=3,
                )

        else:
            from neddf_tpu.ops.dual import pe_dual_planes_mip

            cd = jnp.dtype(self.compute_dtype)
            cast = (lambda t: t.astype(cd)) if cd != jnp.float32 else (lambda t: t)
            # lane-packed, bitwise = pe_dual_planes(pos, rank, crow * w_mip)
            emb_v, emb_j = pe_dual_planes_mip(
                pos, self.embed_pos_rank, var=var, chan_scale=crow
            )
            v0, m = pad_rows(cast(emb_v))
            j0, _ = pad_rows(cast(emb_j), axis=1)

            def call(lo, hi):
                return dual_mlp_seg(
                    (v0[lo:hi],), (j0[:, lo:hi],), weights, biases, layout,
                    self.activation_type, (True,), self._kernel_out_dtype(),
                    interp,
                )

        v, j = self._chunked_kernel(call, v0.shape[0], self._KERNEL_ROW_CAP)
        return v[:m], j[:, :m]

    def _color_fused_planes(self, params, vs, js, pe=None, pe_aux=()):
        """Color trunk via the multi-segment kernel: the reference's
        concat([PE(pos), PE(dir), normal, features]) (neddf.py:243-257)
        becomes split first-layer weights; the no-Jacobian segments
        (PE(dir), normal) skip the tangent matmuls entirely. With a
        ``pe`` descriptor the PE segments arrive as RAW pos/dir [M, 3]
        and expand inside the kernel."""
        from neddf_tpu.kernels.dual_mlp import (
            _aux_kinds,
            dual_mlp_seg,
            pad_rows,
        )

        m = vs[0].shape[0]
        vs_p = tuple(pad_rows(v)[0] for v in vs)
        js_p = tuple(pad_rows(j, axis=1)[0] for j in js)
        # crow rows are replicated per grid step; var arrays pad/slice
        # with the sample rows (classified by DESCRIPTOR, not shape)
        kinds = _aux_kinds(pe)
        aux_p = tuple(
            a if k == "crow" else pad_rows(a)[0]
            for a, k in zip(pe_aux, kinds)
        )
        weights = tuple(l["w"] for l in params["layers_col"])
        biases = tuple(l["b"] for l in params["layers_col"])
        layout = (False,) * len(weights)
        interp = jax.default_backend() != "tpu"

        def call(lo, hi):
            return dual_mlp_seg(
                tuple(v[lo:hi] for v in vs_p),
                tuple(j[:, lo:hi] for j in js_p),
                weights, biases, layout, self.activation_type,
                (True, False, False, True), self._kernel_out_dtype(), interp,
                pe_aux=tuple(
                    a if k == "crow" else a[lo:hi]
                    for a, k in zip(aux_p, kinds)
                ),
                pe=pe,
            )

        v, j = self._chunked_kernel(call, vs_p[0].shape[0], self._KERNEL_ROW_CAP)
        return v[:m], j[:, :m]

    def _directional_color(
        self, params, pos, direction, norm_dir, v_feat, t_feat_dir,
        t_feat, lowpass, var, cast,
    ):
        """K=1 directional color branch shared by the epilogue and
        non-epilogue fused paths: color trunk on [PE(pos) directional
        dual, PE(dir), sg-normal, features] + the [C, 3] output head.
        ``norm_dir`` must arrive stop-gradiented; ``t_feat_dir`` is the
        (stop-grad) tangent direction, ``t_feat`` the feature-tangent
        seed. Returns (color [M, 3], color_t [M, 3])."""
        if _PE_IN_KERNEL[0] == "both":
            # PE(pos) directional dual + PE(dir) expand IN-KERNEL from
            # the raw pos/dir/seed/var (kernels/dual_mlp.py)
            vs = (pos, direction, cast(norm_dir), v_feat)
            js = (t_feat_dir[None], t_feat[None])  # K=1 tangent planes
            hc_v, hc_t = self._color_fused_planes(
                params, vs, js,
                pe=(
                    ("dir", self.embed_pos_rank, True, True),
                    ("plain", self.embed_dir_rank, False, False),
                    None,
                    None,
                ),
                pe_aux=(lowpass, var),
            )
        else:
            embed_dir = positional_encoding_mip(direction, self.embed_dir_rank)
            # lane-packed, bitwise = pe_dual_directional(.., lowpass * w_mip)
            ep_v2, ep_t = pe_dual_directional_mip(
                pos, self.embed_pos_rank, t_feat_dir, var=var,
                chan_scale=lowpass,
            )
            vs = (cast(ep_v2), cast(embed_dir), cast(norm_dir), v_feat)
            js = (cast(ep_t)[None], t_feat[None])
            hc_v, hc_t = self._color_fused_planes(params, vs, js)
        w_co = cast(params["layer_col_out"]["w"])
        b_co = cast(params["layer_col_out"]["b"])
        color = (hc_v @ w_co + b_co).astype(jnp.float32)  # [M, 3]
        color_t = (hc_t[0] @ w_co).astype(jnp.float32)  # [M, 3]
        return color, color_t

    def _apply_fused_epilogue(
        self, params, sched, pos, direction, var, lowpass,
        v_feat, j_feat, batch_size, sampling_size,
    ) -> Dict[str, Array]:
        """Training path with the fused epilogue kernel: heads, density,
        the four trunk penalties, and the color-tangent seed come out of
        ONE pass over the trunk streams (kernels/neddf_epilogue.py),
        then the K=1 directional color branch adds color + the two
        color-side penalties. Exactly equivalent to the reference math
        — pinned in tests/kernels/test_neddf_epilogue.py."""
        from neddf_tpu.kernels.dual_mlp import pad_rows
        from neddf_tpu.kernels.neddf_epilogue import (
            TILE as EPI_TILE,
            neddf_epilogue,
        )

        sg = jax.lax.stop_gradient
        cd = jnp.dtype(self.compute_dtype)
        cast = (lambda t: t.astype(cd)) if cd != jnp.float32 else (lambda t: t)
        interp = jax.default_backend() != "tpu"
        m = pos.shape[0]

        wm = dict(self.penalty_weight)
        wd = params["layer_ddf_out"]["w"]  # [C, 1]
        wa = params["layer_aux_out"]["w"]  # [C, 1]
        b2 = jnp.concatenate(
            [params["layer_ddf_out"]["b"], params["layer_aux_out"]["b"]],
            axis=0,
        ).astype(jnp.float32)
        scal = jnp.stack([
            jnp.float32(self.d_near),
            sched.aux_grad_scale,
            sched.distance_range_max,
            jnp.float32(wm.get("constraints_aux_grad", 1.0)),
            jnp.float32(wm.get("constraints_dDdt", 1.0)),
            jnp.float32(wm.get("range_distance", 1.0)),
            jnp.float32(wm.get("range_aux_grad", 1.0)),
            jnp.float32(0.0),
        ])
        vp, _ = pad_rows(v_feat, EPI_TILE)
        jp, _ = pad_rows(j_feat, EPI_TILE, axis=1)

        # chunk at the verified kernel row cap like every other call
        def epi_call(lo, hi):
            return neddf_epilogue(
                vp[lo:hi], jp[:, lo:hi], wd, wa, b2, scal,
                self._kernel_out_dtype(), interp,
            )

        mp, cap = vp.shape[0], self._KERNEL_ROW_CAP
        if mp <= cap:
            packed, t_feat = epi_call(0, mp)
        else:
            chunks = [epi_call(lo, min(lo + cap, mp))
                      for lo in range(0, mp, cap)]
            packed = jnp.concatenate([c[0] for c in chunks], axis=0)
            t_feat = jnp.concatenate([c[1] for c in chunks], axis=0)
        packed = packed[:m]
        density = packed[:, 0]
        distance = packed[:, 1]
        aux_grad = packed[:, 2]
        pen4 = packed[:, 9]
        norm_dir = sg(packed[:, 3:6])  # [M, 3]
        t_dir = sg(packed[:, 6:9])  # [M, 3]
        t_feat = t_feat[:m]

        # ---- K=1 directional color branch ----
        color, color_t = self._directional_color(
            params, pos, direction, norm_dir, v_feat, t_dir, t_feat,
            lowpass, var, cast,
        )

        p_range_color = jnp.sum(
            jnp.square(relu(-color) + relu(color - 1.0)), axis=1
        )
        p_constraints_color = jnp.sum(jnp.square(color_t), axis=1)
        fields_penalty = (
            pen4
            + wm.get("range_color", 1.0) * p_range_color
            + wm.get("constraints_color", 1.0) * p_constraints_color
        )
        return {
            "distance": distance.reshape(batch_size, sampling_size),
            "density": density.reshape(batch_size, sampling_size),
            "color": color.reshape(batch_size, sampling_size, 3),
            "fields_penalty": fields_penalty.reshape(
                batch_size, sampling_size
            ),
            "aux_grad": aux_grad.reshape(batch_size, sampling_size),
        }

    def apply(
        self,
        params: Dict[str, Array],
        sampling: Sampling,
        sched: Schedule,
        *,
        need_aux: bool = True,
    ) -> Dict[str, Array]:
        batch_size, sampling_size = sampling.sample_pos.shape[:2]
        act, dact = ACTIVATIONS[self.activation_type]
        density_act, _ = ACTIVATIONS[self.density_activation_type]
        sg = jax.lax.stop_gradient

        pos = sampling.sample_pos.reshape(-1, 3)
        direction = sampling.sample_dir.reshape(-1, 3)
        var = sampling.diag_variance.reshape(-1, 3)

        grad_scale = pe_grad_scale(self.embed_pos_rank)
        lowpass = pe_lowpass_scale(self.embed_pos_rank, sched.lowpass_alpha)

        # --- DDF trunk on dual tensors -----------------------------------
        cd = jnp.dtype(self.compute_dtype)
        cast = (lambda t: t.astype(cd)) if cd != jnp.float32 else (lambda t: t)
        fused = self._use_fused()
        if fused:
            # the PE dual expands INSIDE the trunk kernel from raw
            # pos/var + this constant row (see _trunk_fused_planes)
            v_feat, j_feat = self._trunk_fused_planes(
                params, pos, var, grad_scale * lowpass
            )
            if need_aux and _EPILOGUE[0]:
                return self._apply_fused_epilogue(
                    params, sched, pos, direction, var, lowpass,
                    v_feat, j_feat, batch_size, sampling_size,
                )

            # BOTH 1-wide heads in ONE [C, 2] matmul: two separate head
            # dots would each stream the full [3, M, C] Jacobian planes
            # from HBM again — the glue here is bandwidth-bound, so the
            # combined weight halves the dominant head-read traffic.
            # Tangents stay in PLANE layout [3, M] ([3,M]<->[M,3]
            # relayouts are sublane shuffles that cost real time).
            w2 = jnp.concatenate(
                [cast(params["layer_ddf_out"]["w"]),
                 cast(params["layer_aux_out"]["w"])], axis=1,
            )  # [C, 2]
            b2 = jnp.concatenate(
                [cast(params["layer_ddf_out"]["b"]),
                 cast(params["layer_aux_out"]["b"])], axis=0,
            )
            hv2 = (v_feat @ w2 + b2).astype(jnp.float32)  # [M, 2]
            hj2 = (j_feat @ w2).astype(jnp.float32)  # [3, M, 2]
            ddf_out, aux_out = hv2[:, :1], hv2[:, 1:]
            ddf_jac_p, aux_jac_p = hj2[..., 0], hj2[..., 1]  # [3, M] each
        else:
            weights = pe_weights(var, self.embed_pos_rank)
            embed_scaled = pe_dual(
                pos, self.embed_pos_rank, grad_scale * lowpass * weights
            )
            h = cast(embed_scaled)
            for layer_id, layer in enumerate(params["layers_ddf"]):
                h = act_dual(
                    linear_dual(h, cast(layer["w"]), cast(layer["b"])), act, dact
                )
                h = tp_gather(h, self.tp_axis, self.ddf_layer_width)
                if layer_id in self.skips:
                    h = jnp.concatenate([cast(embed_scaled), h], axis=-1)
            features = h  # dual [M, 4, W]

            ddf = linear_dual(
                features,
                cast(params["layer_ddf_out"]["w"]),
                cast(params["layer_ddf_out"]["b"]),
            ).astype(jnp.float32)
            ddf_out = dual_value(ddf)  # [M, 1] pre-activation
            ddf_jac_p = jnp.transpose(dual_jacobian(ddf)[:, :, 0])  # [3, M]
            aux = linear_dual(
                features,
                cast(params["layer_aux_out"]["w"]),
                cast(params["layer_aux_out"]["b"]),
            ).astype(jnp.float32)
            aux_out = dual_value(aux)
            aux_jac_p = jnp.transpose(dual_jacobian(aux)[:, :, 0])  # [3, M]

        # head activations on (value, tangent) pairs — same chain rule as
        # act_dual, on [M, 1] values / [3, M] tangent PLANES (plane-major
        # throughout: the only [3,M]->[M,3] relayout left is the color
        # kernel's normal-segment input)
        distance = softplus(ddf_out) + self.d_near  # [M, 1]
        distance_grad_p = softplus_deriv(ddf_out)[:, 0][None] * ddf_jac_p  # [3, M]
        aux_grad = sched.aux_grad_scale * sigmoid(aux_out)  # [M, 1]
        aux_gg_p = (
            (sched.aux_grad_scale * sigmoid_deriv(aux_out))[:, 0][None]
            * aux_jac_p
        )  # [3, M]

        # --- density from the distance field's spatial gradient ----------
        grad_sq = jnp.sum(jnp.square(distance_grad_p), axis=0)  # [M]
        distance_grad_norm = jnp.sqrt(grad_sq)  # [M] = ||grad D||
        # || [grad D, aux] || — same sum of squares as the reference's
        # norm over the concat (neddf.py:234-240)
        d_ddt = jnp.sqrt(grad_sq + jnp.square(aux_grad[:, 0]))  # [M]
        distance_inv = 1.0 / distance[:, 0]  # [M]
        density = density_act(distance_inv * (1.0 - d_ddt))  # [M]
        norm_dir_p = distance_grad_p / (distance_grad_norm[None] + 1e-7)
        norm_dir = jnp.transpose(norm_dir_p)  # [M, 3] (color input layout)

        # --- color branch (dual, to get colorJ for the penalty) ----------
        m = pos.shape[0]
        if not need_aux:
            # EVAL fast path: the color-branch Jacobian's only consumer is
            # the constraints_color penalty — skip the 3 tangent streams
            # (the dual color kernel is ~3x the value-only cost)
            embed_dir = positional_encoding_mip(direction, self.embed_dir_rank)
            ep_val = positional_encoding_mip(
                pos, self.embed_pos_rank, var=var, chan_scale=lowpass
            )
            if fused:
                from neddf_tpu.kernels.dual_mlp import pad_rows
                from neddf_tpu.kernels.mlp import TILE_M as MLP_TILE, mlp_seg

                segs = (cast(ep_val), cast(embed_dir), cast(sg(norm_dir)), v_feat)
                padded = [pad_rows(x, MLP_TILE) for x in segs]
                w_col = tuple(l["w"] for l in params["layers_col"])
                b_col = tuple(l["b"] for l in params["layers_col"])

                # chunk at the same row cap as every other kernel call —
                # a large eval chunk (e.g. 8192 rays x 259 samples) must
                # not produce a single call outside the verified M regime
                def col_call(lo, hi):
                    return mlp_seg(
                        tuple(x[lo:hi] for x, _ in padded),
                        w_col, b_col, (False,) * len(w_col),
                        self.activation_type, self._kernel_out_dtype(),
                        jax.default_backend() != "tpu",
                    )

                mp = padded[0][0].shape[0]
                cap = self._KERNEL_ROW_CAP
                if mp <= cap:
                    hc = col_call(0, mp)[:m]
                else:
                    hc = jnp.concatenate(
                        [col_call(lo, min(lo + cap, mp))
                         for lo in range(0, mp, cap)],
                        axis=0,
                    )[:m]
            else:
                hc = cast(
                    jnp.concatenate(
                        [ep_val, embed_dir, sg(norm_dir), dual_value(features)],
                        axis=1,
                    )
                )
                for layer in params["layers_col"]:
                    hc = act(hc @ cast(layer["w"]) + cast(layer["b"]))
                    hc = tp_gather(hc, self.tp_axis, self.col_layer_width)
            w_co = cast(params["layer_col_out"]["w"])
            b_co = cast(params["layer_col_out"]["b"])
            color = (hc @ w_co + b_co).astype(jnp.float32)
            fields_penalty = jnp.zeros((m,), jnp.float32)
            return {
                "distance": distance.reshape(batch_size, sampling_size),
                "density": density.reshape(batch_size, sampling_size),
                "color": color.reshape(batch_size, sampling_size, 3),
                "fields_penalty": fields_penalty.reshape(batch_size, sampling_size),
                "aux_grad": aux_grad.reshape(batch_size, sampling_size),
            }
        # DIRECTIONAL color JVP (K=1): the color Jacobian's only consumer
        # is constraints_color = sum_c (sum_a colorJ[a,:,c] * sg(gradD)[a])^2
        # — a derivative along the SINGLE direction sg(distance_grad_p).
        # The reference materialises the full 3-plane Jacobian
        # (neddf.py:243-257) and contracts at the end; contracting at the
        # SEED (tangent = J_input . gradD) propagates one tangent plane
        # instead of three — the tangent path is linear, so the result is
        # identical up to f32 summation order — and halves the color
        # trunk's streams/FLOPs (kernel K=1 vs K=3).
        t_dir = sg(jnp.transpose(distance_grad_p))  # [M, 3]
        if fused:
            # feature tangent seed: contract the trunk Jacobian planes
            # with the (stop-grad) direction — one pass over [3, M, C]
            t_feat = jnp.sum(
                j_feat * cast(t_dir).T[:, :, None], axis=0
            )  # [M, C]
            color, color_t = self._directional_color(
                params, pos, direction, sg(norm_dir), v_feat, t_dir,
                t_feat, lowpass, var, cast,
            )
        else:
            embed_dir = positional_encoding_mip(direction, self.embed_dir_rank)
            ep_v2, ep_t = pe_dual_directional_mip(
                pos, self.embed_pos_rank, t_dir, var=var, chan_scale=lowpass
            )
            t_feat = jnp.sum(
                dual_jacobian(features) * cast(t_dir)[:, :, None], axis=1
            )  # [M, C]
            col_y = jnp.concatenate(
                [
                    ep_v2,
                    embed_dir,
                    sg(norm_dir),
                    dual_value(features),
                ],
                axis=1,
            )
            col_t = jnp.concatenate(
                [
                    ep_t,
                    jnp.zeros((m, embed_dir.shape[1] + 3), col_y.dtype),
                    t_feat,
                ],
                axis=1,
            )
            hc = cast(
                jnp.concatenate([col_y[:, None, :], col_t[:, None, :]], axis=1)
            )  # [M, 2, C] dual with one tangent row
            for layer in params["layers_col"]:
                hc = act_dual(
                    linear_dual(hc, cast(layer["w"]), cast(layer["b"])), act, dact
                )
                hc = tp_gather(hc, self.tp_axis, self.col_layer_width)
            col = linear_dual(
                hc,
                cast(params["layer_col_out"]["w"]),
                cast(params["layer_col_out"]["b"]),
            ).astype(jnp.float32)
            color = col[:, 0, :]  # [M, 3]
            color_t = col[:, 1, :]  # [M, 3] directional derivative

        # --- field-constraint penalties (stop_gradient placements match
        #     neddf.py:259-300) ------------------------------------------
        penalties: Dict[str, Array] = {}  # every term is an [M] vector
        d2d_dwdt = jnp.sum(aux_gg_p * norm_dir_p, axis=0)  # [M]
        d2d_dwdt_rest = 3.0 * aux_grad[:, 0] * sg(distance_inv)
        ag_scale = (
            sg(aux_grad[:, 0]) * sg(distance_grad_norm) * sg(distance[:, 0])
        )
        penalties["constraints_aux_grad"] = ag_scale * jnp.square(
            d2d_dwdt - d2d_dwdt_rest
        )
        penalties["constraints_dDdt"] = jnp.square(relu(d_ddt - 1.0))
        penalties["range_distance"] = jnp.square(
            relu(-4.6 - ddf_out[:, 0])
            + relu(ddf_out[:, 0] - sched.distance_range_max)
        )
        penalties["range_aux_grad"] = jnp.square(
            relu(-4.6 - aux_out[:, 0]) + relu(aux_out[:, 0] - 4.6)
        )
        penalties["range_color"] = jnp.sum(
            jnp.square(relu(-color) + relu(color - 1.0)), axis=1
        )
        # color_t IS the contraction colorJ . sg(gradD) (see the seeding
        # note above), so the penalty is just its squared norm
        penalties["constraints_color"] = jnp.sum(jnp.square(color_t), axis=1)
        weight_map = dict(self.penalty_weight)
        fields_penalty = sum(
            weight_map.get(k, 1.0) * v for k, v in penalties.items()
        )

        return {
            "distance": distance.reshape(batch_size, sampling_size),
            "density": density.reshape(batch_size, sampling_size),
            "color": color.reshape(batch_size, sampling_size, 3),
            "fields_penalty": fields_penalty.reshape(batch_size, sampling_size),
            "aux_grad": aux_grad.reshape(batch_size, sampling_size),
        }
