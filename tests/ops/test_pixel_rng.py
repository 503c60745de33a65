"""Per-pixel RNG: sampling draws depend on (key, pixel), not batch layout.

This property underpins (a) bitwise mesh-shape invariance of the
shard_map DP step (parallel/mesh.py) and (b) chunk-size invariance of
eval renders (render_image)."""
import jax.numpy as jnp
import numpy as np

from neddf_tpu.ops.sampling import sample_pdf, stratified_dists


def test_stratified_shard_invariant(key):
    pids = jnp.arange(64, dtype=jnp.int32) * 7 + 3
    full = stratified_dists(key, 64, 16, 2.0, 6.0, pixel_ids=pids)
    lo = stratified_dists(key, 32, 16, 2.0, 6.0, pixel_ids=pids[:32])
    hi = stratified_dists(key, 32, 16, 2.0, 6.0, pixel_ids=pids[32:])
    np.testing.assert_array_equal(
        np.asarray(full), np.asarray(jnp.concatenate([lo, hi], 0))
    )


def test_sample_pdf_shard_invariant(key, rng):
    b, s, k = 48, 9, 12
    dists = jnp.sort(jnp.asarray(rng.uniform(2, 6, (b, s)).astype(np.float32)), axis=-1)
    weights = jnp.asarray(rng.uniform(0, 1, (b, s - 1)).astype(np.float32))
    pids = jnp.asarray(rng.choice(10_000, b, replace=False).astype(np.int32))
    full = sample_pdf(key, dists, weights, k, pixel_ids=pids)
    parts = [
        sample_pdf(key, dists[i : i + 16], weights[i : i + 16], k,
                   pixel_ids=pids[i : i + 16])
        for i in (0, 16, 32)
    ]
    np.testing.assert_array_equal(
        np.asarray(full), np.asarray(jnp.concatenate(parts, 0))
    )


def test_pixel_ids_permutation_equivariant(key):
    """Permuting the rays permutes the draws identically — the property
    the legacy (counter-indexed) path lacks for arbitrary gather orders."""
    pids = jnp.asarray([5, 17, 2, 900, 31, 44, 7, 123], jnp.int32)
    perm = jnp.asarray([3, 0, 7, 1, 5, 2, 6, 4], jnp.int32)
    a = stratified_dists(key, 8, 4, 2.0, 6.0, pixel_ids=pids)
    b = stratified_dists(key, 8, 4, 2.0, 6.0, pixel_ids=pids[perm])
    np.testing.assert_array_equal(np.asarray(a[perm]), np.asarray(b))
