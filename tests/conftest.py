"""Test fixtures.

Forces JAX onto a virtual 8-device CPU platform so tests are fast,
deterministic (exact f32 matmuls), and can exercise multi-device sharding
without TPU hardware. NOTE: this environment's sitecustomize registers an
``axon`` TPU backend at interpreter start and pins JAX_PLATFORMS=axon, so
plain env vars are too late — we must go through jax.config before the
first backend initialisation.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the bunny_smoke scene is BUNDLED (data/bunny_smoke, round-4 verdict
# item 6) so the parity tests are hermetic; the reference mount is only
# a fallback for older checkouts
_REPO_DATA = os.path.join(os.path.dirname(__file__), "..", "data", "bunny_smoke")
REFERENCE_DATA = (
    os.path.abspath(_REPO_DATA)
    if os.path.isdir(_REPO_DATA)
    else "/root/reference/data/bunny_smoke"
)
if not os.path.isdir(REFERENCE_DATA):
    # hermetic fallback: generate an analytic scene so the suite runs
    # without the reference repository mounted
    import atexit
    import shutil
    import tempfile

    from neddf_tpu.data.synthetic import generate_sphere_dataset

    REFERENCE_DATA = str(
        generate_sphere_dataset(
            tempfile.mkdtemp(prefix="neddf_scene_"), n_train=8, n_test=2,
            image_size=64,
        )
    )
    atexit.register(shutil.rmtree, REFERENCE_DATA, True)


@pytest.fixture()
def rng():
    return np.random.default_rng(3408)


@pytest.fixture()
def key():
    return jax.random.PRNGKey(3408)


@pytest.fixture()
def calib_params():
    # focal/center roughly matching an 800x800 blender render
    return jnp.array([1111.1, 1111.1, 400.0, 400.0], dtype=jnp.float32)
