"""Renderer tests (reference pattern: tests/render/test_nerf_render.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neddf_tpu.geometry import PinholeCalib, camera_pose
from neddf_tpu.render import NeRFRender

SMALL_NERF = {
    "_target_": "neddf_tpu.fields.NeRF",
    "embed_pos_rank": 4,
    "embed_dir_rank": 2,
    "layer_count": 3,
    "layer_width": 16,
    "skips": [1],
}
SMALL_NEDDF = {
    "_target_": "neddf_tpu.fields.NeDDF",
    "embed_pos_rank": 4,
    "embed_dir_rank": 2,
    "ddf_layer_count": 4,
    "ddf_layer_width": 16,
    "col_layer_count": 3,
    "col_layer_width": 16,
    "skips": [1],
}


@pytest.fixture(scope="module")
def camera():
    calib = PinholeCalib(jnp.array([138.9, 138.9, 50.0, 50.0], jnp.float32))
    init = jnp.array([0.1, -0.2, 0.3, 0.5, 0.5, 4.0], jnp.float32)
    r, t = camera_pose(init, jnp.zeros(6))
    return calib, r, t


def _make_renderer(net_cfg, **kw):
    defaults = dict(sample_coarse=8, sample_fine=8, dist_near=2.0, dist_far=6.0,
                    max_dist=6.0, use_coarse_network=True, sampling_type="point")
    defaults.update(kw)
    return NeRFRender(network_config=net_cfg, **defaults)


def test_render_rays_nerf_keys_and_shapes(camera, key):
    renderer = _make_renderer(SMALL_NERF)
    params = renderer.init(key)
    calib, r, t = camera
    uv = jnp.stack([jnp.arange(4, dtype=jnp.int32) * 10] * 2, axis=1)
    out = renderer.render_rays(params, calib, r, t, uv, key, 0)
    for k in ["weight", "depth", "color", "transmittance"]:
        assert k in out and f"{k}_coarse" in out
    assert out["color"].shape == (4, 3)
    assert out["depth"].shape == (4,)
    assert out["weight"].shape == (4, 8 + 8 + 1)  # fine = coarse+1 cat coarse, -1
    assert np.isfinite(np.asarray(out["color"])).all()


def test_render_rays_neddf_penalty_integrals(camera, key):
    renderer = _make_renderer(SMALL_NEDDF, use_coarse_network=False,
                              sampling_type="cone")
    params = renderer.init(key)
    assert "network_coarse" not in params  # shared net
    calib, r, t = camera
    uv = jnp.stack([jnp.arange(4, dtype=jnp.int32) * 10] * 2, axis=1)
    out = renderer.render_rays(params, calib, r, t, uv, key, 0)
    assert "fields_penalty" in out and "fields_penalty_coarse" in out
    assert out["fields_penalty"].shape == (4,)
    assert np.isfinite(np.asarray(out["fields_penalty"])).all()


def test_render_rays_jit_and_grad(camera, key):
    renderer = _make_renderer(SMALL_NEDDF, use_coarse_network=False)
    params = renderer.init(key)
    calib, r, t = camera
    uv = jnp.stack([jnp.arange(4, dtype=jnp.int32) * 10] * 2, axis=1)

    def loss(p):
        out = renderer.render_rays(p, calib, r, t, uv, key, 5)
        return jnp.mean(jnp.square(out["color"])) + jnp.mean(out["fields_penalty"])

    g = jax.jit(jax.grad(loss))(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_render_image_shapes(camera, key):
    renderer = _make_renderer(SMALL_NERF)
    params = renderer.init(key)
    calib, r, t = camera
    images = renderer.render_image(
        params, calib, r, t, width=20, height=12, target_types=["color", "depth"],
        downsampling=2, chunk=16,
    )
    assert images["color"].shape == (6, 10, 3)
    assert images["depth"].shape == (6, 10, 1)
    assert np.isfinite(images["color"]).all()


def test_render_field_slice(key):
    renderer = _make_renderer(SMALL_NEDDF, use_coarse_network=False)
    params = renderer.init(key)
    fields = renderer.render_field_slice(params, render_resolution=16)
    assert set(fields) == {"distance", "density", "color", "aux_grad"}
    for img in fields.values():
        assert img.shape == (16, 16, 3)
        assert img.dtype == np.uint8
