"""SDF trunk with an explicit in-trunk reverse sweep for the normals.

NeuS needs h = trunk(PE(pos)) AND the spatial gradient of ONE output
channel, d h[:, 0] / d pos (reference neus.py:133-142 via
torch.autograd.grad with create_graph). Reverse mode is the right
transposition for a 1-output/3-input gradient — the forward-mode
alternative (the dual kernel, K=3 tangent planes through every layer)
measured 2.2x SLOWER (fields/neus.py normals="dual" notes).

This module writes that reverse sweep EXPLICITLY instead of calling
jax.grad: ``sdf_trunk_with_grad`` returns (h [M, C], gE [M, E] =
d h[:,0] / d embed) as a pure, jax-differentiable program — the
behavioural oracle for (and jnp twin of) the fused Pallas kernel in
kernels/sdf_mlp.py, which mirrors it tile-by-tile in VMEM with a
hand-written second-order VJP.

Layer/layout conventions match kernels/mlp.py: ``layout[l]`` marks a
post-skip layer whose input is ``[h_{l-1}, e]`` (hidden FIRST — the
NeRF/NeuS concat order, neus.py:135-137) with weight rows
``[:C_hidden]`` for the hidden state and ``[C_hidden:]`` for ``e``.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def sdf_trunk_with_grad(
    e: Array,
    weights: Sequence[Array],
    biases: Sequence[Array],
    layout: Sequence[bool],
    act_name: str,
) -> Tuple[Array, Array]:
    """(features h [M, C], gE [M, E] = d h[:, 0] / d e).

    The reverse sweep is algebraically what jax.grad of
    ``sum(h[:, 0])`` produces, written out so the Pallas kernel can
    mirror it exactly: p_{L-1} = onehot0 * f'(z_{L-1}); downward
    q_l = p_l @ W_l^T, p_{l-1} = q_l[hidden] * f'(z_{l-1}); gE collects
    the e-rows of layer 0 and every post-skip layer.
    """
    from neddf_tpu.kernels.dual_mlp import _act_fns

    f, df, _ = _act_fns(act_name)
    n_layers = len(weights)
    e_dim = e.shape[-1]

    zs = []
    h = None
    for li in range(n_layers):
        w, b = weights[li], biases[li]
        if li == 0:
            z = e @ w + b
        elif layout[li]:
            c = h.shape[-1]
            z = h @ w[:c] + e @ w[c:] + b
        else:
            z = h @ w + b
        zs.append(z)
        h = f(z)

    # reverse sweep for channel 0
    c_out = h.shape[-1]
    p = df(zs[-1]) * jax.nn.one_hot(0, c_out, dtype=h.dtype)[None, :]
    gE = jnp.zeros((e.shape[0], e_dim), h.dtype)
    for li in range(n_layers - 1, -1, -1):
        q = p @ weights[li].T  # [M, C_in_l]
        if li == 0:
            gE = gE + q
        elif layout[li]:
            c = weights[li].shape[0] - e_dim
            gE = gE + q[:, c:]
            p = q[:, :c] * df(zs[li - 1])
        else:
            p = q * df(zs[li - 1])
    return h, gE


def pe_chain_to_pos(gE: Array, pos: Array, rank: int) -> Array:
    """Chain d(loss-free) h0-gradient from PE channels to positions:
    gradients[:, a] = sum_k gE[:, k] * d PE_k / d pos_a. Each PE channel
    depends on exactly one axis, so the contraction is an elementwise
    multiply + channel-to-axis sum (no [M, 3, 6R] Jacobian)."""
    m, d = pos.shape
    freq = 2.0 ** jnp.arange(rank, dtype=pos.dtype)
    f_rep = jnp.repeat(freq, d)[None, :]
    p = f_rep * jnp.tile(pos, (1, rank))
    # d sin/cos halves w.r.t. their own phase, times d phase/d pos = f
    g_sin = f_rep * jnp.cos(p)
    g_cos = -f_rep * jnp.sin(p)
    per_chan = gE[:, : rank * d] * g_sin + gE[:, rank * d :] * g_cos
    # channel k -> axis k % d
    sel = (
        (jnp.arange(rank * d)[:, None] % d) == jnp.arange(d)[None, :]
    ).astype(pos.dtype)
    return per_chan @ sel
