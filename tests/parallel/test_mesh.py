"""Multi-device sharding tests on the virtual 8-device CPU mesh —
coverage the single-GPU reference entirely lacks."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neddf_tpu.geometry import PinholeCalib
from neddf_tpu.parallel import (
    make_mesh,
    make_sharded_render,
    make_sharded_train_step,
    replicated,
    shard_field_params,
)
from neddf_tpu.render import NeRFRender
from neddf_tpu.training.losses import ColorLoss, FieldsConstraintLoss, MaskBCELoss

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


def _setup(mesh, key):
    renderer = NeRFRender(
        network_config=SMALL_NEDDF, sample_coarse=4, sample_fine=4,
        use_coarse_network=False, sampling_type="cone",
    )
    params = shard_field_params(renderer.init(key), mesh)
    calib = PinholeCalib(
        jax.device_put(jnp.array([10.0, 10.0, 4.0, 4.0]), replicated(mesh))
    )
    return renderer, params, calib


@pytest.mark.parametrize("model", [1, 2])
def test_sharded_train_step_runs(model, key):
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, model=model)
    renderer, params, calib = _setup(mesh, key)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    losses = [ColorLoss(), MaskBCELoss(0.05), FieldsConstraintLoss(0.01)]

    h = w = 8
    n_cam = 2
    rgb = jax.device_put(
        jnp.ones((n_cam, h, w, 3), jnp.float32) * 128, replicated(mesh)
    )
    mask = jax.device_put(jnp.ones((n_cam, h, w), jnp.float32) * 255, replicated(mesh))
    cam_init = jax.device_put(
        jnp.zeros((n_cam, 6), jnp.float32).at[:, 5].set(4.0), replicated(mesh)
    )
    cam_delta = jax.device_put(jnp.zeros((n_cam, 6), jnp.float32), replicated(mesh))

    step = make_sharded_train_step(
        renderer, losses, calib, mesh, tx, batch_size=16, image_height=h, image_width=w
    )
    # host copy BEFORE the step: the jitted step donates params buffers
    params_before = jax.device_get(params)
    params2, opt_state, loss, mse = step(
        params, opt_state, cam_delta, rgb, mask, cam_init, key,
        jnp.int32(0), jnp.int32(0),
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(mse))
    # params actually moved (optimizer applied a nonzero update)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(params2), params_before,
    )
    assert max(jax.tree_util.tree_leaves(deltas)) > 0.0


SMALL_NERF = {
    "_target_": "neddf_tpu.fields.NeRF",
    "embed_pos_rank": 4,
    "embed_dir_rank": 2,
    "layer_count": 4,
    "layer_width": 16,
    "skips": [1],
}

SMALL_NEUS = {
    "_target_": "neddf_tpu.fields.NeuS",
    "embed_pos_rank": 3,
    "embed_dir_rank": 2,
    "sdf_layer_count": 4,
    "sdf_layer_width": 16,
    "col_layer_count": 3,
    "col_layer_width": 16,
    "skips": [1],
}


def _run_one_step(renderer, losses, mesh, key):
    """One sharded train step; returns (loss, mse, updated params host tree)."""
    tx = optax.adam(1e-3)
    h = w = 8
    # fresh init per run: the jitted step donates its params buffers,
    # so each mesh needs its own copies
    params = shard_field_params(renderer.init(key), mesh)
    calib = PinholeCalib(
        jax.device_put(jnp.array([10.0, 10.0, 4.0, 4.0]), replicated(mesh))
    )
    rgb = jax.device_put(jnp.ones((1, h, w, 3)) * 128, replicated(mesh))
    mask = jax.device_put(jnp.ones((1, h, w)) * 255, replicated(mesh))
    ci = jax.device_put(jnp.zeros((1, 6)).at[:, 5].set(4.0), replicated(mesh))
    cd = jax.device_put(jnp.zeros((1, 6)), replicated(mesh))
    step = make_sharded_train_step(
        renderer, losses, calib, mesh, tx, batch_size=8, image_height=h, image_width=w
    )
    params2, _, loss, mse = step(
        params, tx.init(params), cd, rgb, mask, ci, key, jnp.int32(0), jnp.int32(0)
    )
    return float(loss), float(mse), jax.device_get(params2)


def test_sharded_matches_single_device(key):
    """DP-sharded step must produce the same numbers as an unsharded run
    (determinism across mesh shapes)."""
    renderer = NeRFRender(
        network_config=SMALL_NEDDF, sample_coarse=4, sample_fine=4,
        use_coarse_network=False,
    )
    losses = [ColorLoss(), FieldsConstraintLoss(0.01)]
    loss8, mse8, _ = _run_one_step(renderer, losses, make_mesh(8), key)
    loss1, mse1, _ = _run_one_step(renderer, losses, make_mesh(1), key)
    assert loss8 == pytest.approx(loss1, rel=1e-4)
    assert mse8 == pytest.approx(mse1, rel=1e-4)


@pytest.mark.parametrize(
    "net_cfg,losses",
    [
        (SMALL_NEDDF, "neddf"),
        (SMALL_NERF, "plain"),
        (SMALL_NEUS, "plain"),
    ],
    ids=["neddf", "nerf", "neus"],
)
@pytest.mark.parametrize("model", [2, 4])
def test_tp_shard_map_step_matches_single_device(net_cfg, losses, model, key):
    """Tensor-parallel (shard_map, explicit width-shard collectives)
    train step == unsharded single-device step: loss, mse AND the
    updated parameters. This is the numeric TP guarantee the GSPMD
    route cannot give on this substrate (see the xfail below); it also
    pins the grad-inside-shard_map rescaling in parallel/mesh.py."""
    renderer = NeRFRender(
        network_config=net_cfg, sample_coarse=4, sample_fine=4,
        use_coarse_network=False,
    )
    loss_fns = (
        [ColorLoss(), FieldsConstraintLoss(0.01)]
        if losses == "neddf" else [ColorLoss()]
    )
    loss_tp, mse_tp, params_tp = _run_one_step(
        renderer, loss_fns, make_mesh(8, model=model), key
    )
    loss_1, mse_1, params_1 = _run_one_step(renderer, loss_fns, make_mesh(1), key)
    assert loss_tp == pytest.approx(loss_1, rel=1e-4)
    assert mse_tp == pytest.approx(mse_1, rel=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_tp), jax.tree_util.tree_leaves(params_1)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


def test_tp_shard_map_render_matches_single_device(key):
    """TP (model=2) shard_map eval render == unsharded pixels."""
    mesh = make_mesh(8, model=2)
    renderer, params, calib = _setup(mesh, key)
    render = make_sharded_render(renderer, calib, mesh)
    r = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 4.0])
    uv = jnp.stack(
        [jnp.arange(16, dtype=jnp.int32) % 8,
         jnp.arange(16, dtype=jnp.int32) // 2 % 8], axis=1
    )
    out = render(params, r, t, uv, key)
    assert out["color"].sharding.is_fully_replicated

    params_local = jax.device_get(params)
    ref = renderer.render_rays(
        jax.tree_util.tree_map(jnp.asarray, params_local),
        PinholeCalib(jnp.array([10.0, 10.0, 4.0, 4.0])),
        r, t, uv, key, -1,
    )
    np.testing.assert_allclose(
        np.asarray(out["color"]), np.asarray(ref["color"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), rtol=1e-5, atol=1e-5
    )


def test_sharded_render_replicates_tiles(key):
    mesh = make_mesh(8, model=2)
    renderer, params, calib = _setup(mesh, key)
    render = make_sharded_render(renderer, calib, mesh)
    r = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 4.0])
    uv = jnp.stack([jnp.arange(16, dtype=jnp.int32) % 8] * 2, axis=1)
    out = render(params, r, t, uv, key)
    assert out["color"].shape == (16, 3)
    # output replicated on all devices
    assert out["color"].sharding.is_fully_replicated


def test_sharded_render_matches_single_device(key):
    """DP-sharded eval render must reproduce the single-device pixels
    bit-near (per-pixel RNG + unchanged local program).

    NOT asserted for a model>1 (TP) mesh: the XLA CPU SPMD partitioner
    deterministically miscompiles the full multi-output apply program
    under width-sharded weights (Jacobian-derived outputs diverge while
    every bisected component matches to f32 roundoff) — see
    test_tp_full_apply_matches_density_only below."""
    mesh = make_mesh(8, model=1)
    renderer, params, calib = _setup(mesh, key)
    render = make_sharded_render(renderer, calib, mesh)
    r = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 4.0])
    uv = jnp.stack(
        [jnp.arange(16, dtype=jnp.int32) % 8,
         jnp.arange(16, dtype=jnp.int32) // 2 % 8], axis=1
    )
    out = render(params, r, t, uv, key)

    params_local = jax.device_get(params)
    ref = renderer.render_rays(
        jax.tree_util.tree_map(jnp.asarray, params_local),
        PinholeCalib(jnp.array([10.0, 10.0, 4.0, 4.0])),
        r, t, uv, key, -1,
    )
    np.testing.assert_allclose(
        np.asarray(out["color"]), np.asarray(ref["color"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.xfail(
    strict=False,
    reason="XLA CPU SPMD partitioner miscompile: with model-axis "
    "(width) sharded weights, the FULL multi-output NeDDF apply "
    "program computes a different Jacobian-derived density than the "
    "same function restricted to the density output (max diff ~5.3 on "
    "the pretrained net), deterministically, on current jaxlib. "
    "Components (trunk values/Jacobians/heads) and the density-only "
    "program all match to f32 roundoff, and adding a redundant "
    "recomputation to the same program makes apply's density correct "
    "— i.e. value-changing partitioner rewrites, not our math. "
    "Pre-dates the plane-major layout (reproduced at f3ccb95). "
    "DP (model=1) is verified exact and is the recommended mesh for "
    "these 2.5MB-parameter models; this test flips to XPASS when the "
    "toolchain is fixed.",
)
def test_tp_full_apply_matches_density_only(key):
    """Width-sharded (TP) full apply vs density-only apply equality."""
    mesh = make_mesh(8, model=2)
    renderer, params, calib = _setup(mesh, key)
    net = renderer.network_fine
    from neddf_tpu.geometry.rays import Sampling

    rng = np.random.default_rng(3)
    S = Sampling(
        sample_pos=jnp.asarray(rng.uniform(-1.5, 1.5, (8, 16, 3)).astype(np.float32)),
        sample_dir=jnp.asarray(rng.normal(size=(8, 16, 3)).astype(np.float32)),
        diag_variance=jnp.abs(
            jnp.asarray(rng.normal(size=(8, 16, 3)).astype(np.float32))
        ) * 1e-4,
    )
    sched = net.schedule(jnp.int32(-1))
    fp = params["network_fine"]
    full = jax.jit(lambda p: net.apply(p, S, sched)["density"])(fp)
    only = jax.jit(lambda p: net.apply(p, S, sched))(fp)["density"]
    np.testing.assert_allclose(
        np.asarray(only), np.asarray(full), rtol=1e-4, atol=1e-4
    )
