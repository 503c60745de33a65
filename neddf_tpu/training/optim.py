"""Row-sparse Adam for per-camera pose deltas.

The trainer stores every camera's 6-DoF correction in one [n_cam, 6]
table (reference: neddf/camera/camera.py:40 keeps the same 6-vector as
an nn.Parameter), but each train step draws pixels from a SINGLE
camera, so the gradient is zero on every other row. Plain Adam is
wrong for that access pattern: rows absent from the batch keep being
pushed by stale first-moment EMA while their second moment decays —
each real gradient is effectively re-applied with the geometric tail
sum_k b1^k = b1/(1-b1), i.e. ~10x the configured lr, in a direction
that is stale by up to n_cam steps. Diagnosed 2026-08-20 as a driver
of the camera-refinement divergence (pose error grew under
optimization).

``row_sparse_adam`` gives SparseAdam-STYLE masked updates instead (not
drop-in torch parity: torch.optim.SparseAdam bias-corrects with the
global step count; this bias-corrects with per-row visit counts, which
is the statistically honest choice for rows visited at different
rates): rows whose gradient is exactly zero keep their moments and
receive NO update. For a [n_cam, 6] leaf the "row" is every axis-0
slice. Rows containing non-finite gradient entries are treated as
ACTIVE so the NaN/Inf flows into the moments and surfaces in the
params — fail-loud, matching the repo's debug_nans posture — rather
than being silently skipped as "unvisited".
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


class RowSparseAdamState(NamedTuple):
    m: Any  # first-moment EMA, same shape as params
    v: Any  # second-moment EMA, same shape as params
    t: Any  # per-ROW visit counts, shape leaf.shape[0] per leaf


def row_sparse_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam over row-partitioned params where a step's gradient touches
    a subset of rows; zero-gradient rows are left untouched (moments
    frozen, no update) and bias correction uses per-row visit counts."""

    def init(params: Any) -> RowSparseAdamState:
        zeros = lambda p: jnp.zeros_like(p, jnp.float32)
        return RowSparseAdamState(
            m=jax.tree_util.tree_map(zeros, params),
            v=jax.tree_util.tree_map(zeros, params),
            t=jax.tree_util.tree_map(
                lambda p: jnp.zeros((p.shape[0],), jnp.int32), params
            ),
        )

    def update(grads: Any, state: RowSparseAdamState, params: Any = None):
        del params

        def row_active(g: Array) -> Array:
            flat = jnp.abs(g).reshape(g.shape[0], -1)
            s = flat.sum(axis=1)  # [rows]
            # NaN > 0 is False, which would silently drop a divergent
            # row; route non-finite rows through the update so the
            # corruption surfaces in the params (advisor round-4)
            return (s > 0) | ~jnp.isfinite(s)

        def bcast(flag: Array, like: Array) -> Array:
            return flag.reshape((-1,) + (1,) * (like.ndim - 1))

        active = jax.tree_util.tree_map(row_active, grads)
        t = jax.tree_util.tree_map(
            lambda n, a: n + a.astype(jnp.int32), state.t, active
        )
        m = jax.tree_util.tree_map(
            lambda m_, g, a: jnp.where(
                bcast(a, g), b1 * m_ + (1.0 - b1) * g, m_
            ),
            state.m, grads, active,
        )
        v = jax.tree_util.tree_map(
            lambda v_, g, a: jnp.where(
                bcast(a, g), b2 * v_ + (1.0 - b2) * jnp.square(g), v_
            ),
            state.v, grads, active,
        )

        def step(m_: Array, v_: Array, n: Array, a: Array) -> Array:
            # visited rows only; n >= 1 there, so corrections are finite
            tf = jnp.maximum(n, 1).astype(jnp.float32)
            m_hat = m_ / (1.0 - b1 ** bcast(tf, m_))
            v_hat = v_ / (1.0 - b2 ** bcast(tf, v_))
            upd = -learning_rate * m_hat / (jnp.sqrt(v_hat) + eps)
            return jnp.where(bcast(a, m_), upd, 0.0)

        updates = jax.tree_util.tree_map(step, m, v, t, active)
        return updates, RowSparseAdamState(m=m, v=v, t=t)

    return optax.GradientTransformation(init, update)
