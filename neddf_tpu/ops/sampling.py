"""Ray-distance samplers: stratified coarse + hierarchical inverse-CDF fine.

Branchless, static-shape re-designs of the reference algorithms so they
compile once under jit:

* stratified_dists — linspace + U[0, bin) jitter
  (neddf/render/nerf_render.py:131-139).
* sample_pdf — weight sanitisation, +1e-2 floor, optional max-pool blur
  (cat_coarse=False path), L1-normalise -> cumsum -> inverted CDF ->
  linear interp, sort, NaN fallback
  (neddf/render/base_neural_render.py:27-115). The reference's
  data-dependent Python branches (``if torch.any(isnan(...))``) become
  jnp.where masks; searchsorted becomes a broadcast compare-and-sum,
  which vectorises on the VPU for the small per-ray CDFs involved
  (<= a few hundred bins).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _per_ray_uniform(
    key: Array, pixel_ids: Array, n: int, dtype=jnp.float32
) -> Array:
    """[B, n] uniforms where row b depends only on (key, pixel_ids[b]).

    Deriving the draws from the PIXEL identity (not the batch layout)
    makes sampling invariant to how rays are sharded across devices or
    chunked across render calls — a DP step on any mesh shape sees the
    exact same jitter as the unsharded program.
    """
    keys = jax.vmap(lambda p: jax.random.fold_in(key, p))(pixel_ids)
    return jax.vmap(lambda k: jax.random.uniform(k, (n,), dtype=dtype))(keys)


def stratified_dists(
    key: Array,
    batch_size: int,
    sample_count: int,
    dist_near: float,
    dist_far: float,
    pixel_ids: Optional[Array] = None,
) -> Array:
    """[batch, sample_count+1] jittered linspace over [near, far].

    Matches the reference: base linspace of sample_count+1 points plus a
    uniform jitter of one bin width (far-near)/sample_count. With
    ``pixel_ids`` the jitter is a pure function of (key, pixel) — see
    ``_per_ray_uniform``.
    """
    base = jnp.linspace(dist_near, dist_far, sample_count + 1)
    if pixel_ids is None:
        jitter = jax.random.uniform(key, (batch_size, sample_count + 1))
    else:
        jitter = _per_ray_uniform(key, pixel_ids, sample_count + 1)
    return base[None, :] + jitter * ((dist_far - dist_near) / sample_count)


def _inverse_cdf(dists: Array, cdf: Array, u: Array) -> Array:
    """Piecewise-linear inverse CDF, gather-free.

    The textbook formulation (searchsorted -> take_along_axis x4 ->
    lerp) costs ~0.7 ms PER GATHER on TPU (XLA lowers small gathers to
    element-serial loops). The identity

        icdf(u) = d_0 + sum_j (d_{j+1} - d_j) * clip((u - c_j) / (c_{j+1} - c_j), 0, 1)

    computes the same value as one broadcast [B, K, S-1] elementwise op
    + reduce on the VPU — no gathers, no sort, exact same result in
    real arithmetic (zero-width CDF intervals contribute their full
    d-increment once u passes them, which is precisely the
    searchsorted(side='right') behaviour).

    PRECONDITION: every CDF bin must carry non-negligible mass (>> the
    1e-12 guard). ``sample_pdf`` guarantees this via its +1e-2 weight
    floor. For bins narrower than the reference's 1e-5 denominator
    guard the clipped ramp here interpolates *through* the bin while
    the reference collapses to its left edge — a caller with unfloored
    weights would silently diverge from the reference in those bins.

    Args:
        dists: [B, S] ascending distances.
        cdf: [B, S] ascending CDF with cdf[:, 0] == 0, cdf[:, -1] == 1.
        u: [B, K] query quantiles in [0, 1).
    Returns:
        [B, K] samples; monotone in u per row.
    """
    du = dists[:, 1:] - dists[:, :-1]  # [B, S-1]
    dc = jnp.maximum(cdf[:, 1:] - cdf[:, :-1], 1e-12)
    t = (u[:, :, None] - cdf[:, None, :-1]) / dc[:, None, :]
    return dists[:, :1] + jnp.sum(du[:, None, :] * jnp.clip(t, 0.0, 1.0), axis=-1)


def sample_pdf(
    key: Array,
    dists: Array,
    weights: Array,
    samples_fine: int,
    cat_coarse: bool = True,
    pixel_ids: Optional[Array] = None,
) -> Array:
    """Hierarchical inverse-CDF sampling of fine ray distances.

    Args:
        key: PRNG key for the uniform draws.
        dists: [B, S] coarse sample distances (ascending).
        weights: [B, S-1] compositing weights of the coarse intervals.
        samples_fine: number of new samples to draw.
        cat_coarse: concatenate (and re-sort with) the coarse dists.
        pixel_ids: optional [B] ids making draws per-pixel deterministic.

    Returns:
        [B, S + samples_fine] if cat_coarse else [B, samples_fine].
    """
    batch_size = dists.shape[0]

    # sanitise: negatives and NaNs -> 0, then the reference's +1e-2 floor
    w = jnp.where(jnp.isnan(weights) | (weights < 0.0), 0.0, weights) + 1e-2

    if not cat_coarse:
        # 3-tap max-pool blur on the interior (reference :61-68)
        w1 = jnp.maximum(w[:, 2:], w[:, 1:-1])
        w2 = jnp.maximum(w[:, :-2], w[:, 1:-1])
        w = jnp.concatenate([w[:, :1], 0.5 * (w1 + w2), w[:, -1:]], axis=-1)

    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [B, S]

    if pixel_ids is None:
        u = jax.random.uniform(key, (batch_size, samples_fine), dtype=dists.dtype)
    else:
        u = _per_ray_uniform(key, pixel_ids, samples_fine, dtype=dists.dtype)

    samples = _inverse_cdf(dists, cdf, u)

    if cat_coarse:
        samples = jnp.concatenate([samples, dists], axis=-1)
    samples = jnp.sort(samples, axis=-1)

    # NaN fallback -> uniform linspace over the ray's range (reference
    # :105-114 replaces the whole batch; elementwise where is equivalent
    # for the clean-weights case and jit-safe)
    fallback = jnp.linspace(0.0, 1.0, samples.shape[-1], dtype=dists.dtype)
    fallback = dists[:, :1] + fallback[None, :] * (dists[:, -1:] - dists[:, :1])
    return jnp.where(jnp.isnan(samples), fallback, samples)
