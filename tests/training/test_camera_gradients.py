"""Camera-delta gradient correctness (finite differences).

The round-4 camera-refinement investigation (BASELINE.md camera section)
established that pose RECOVERY against a CPU-scale toy field fails for
landscape reasons (multi-modal photometric loss; full-batch GD converges
to a local minimum with loss ABOVE the true-pose floor), not machinery
reasons. These tests pin the machinery itself:

* the gradient through camera_pose -> create_rays -> field.apply ->
  integrate_volume_render -> color MSE (every pose-dependent stage of
  the product step except the DELIBERATELY detached fine-resample
  placement) matches central finite differences to 2%;
* the full product loss gradient (training/step.py::make_local_grads,
  all four losses, coarse+fine) is directionally consistent with full
  FD — exact equality is impossible by design because ``dists_fine`` is
  computed under stop_gradient (render/renderer.py:151, matching the
  reference's detach in base_neural_render.py:161-166), a path FD sees
  but AD intentionally omits.

A frame/sign/composition bug anywhere in the pose chain would fail the
2% check immediately. Reference anchor: neddf/camera/camera.py:40
(Camera.params as an nn.Parameter — the quantity this machinery
optimizes).
"""
import atexit
import shutil
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from neddf_tpu import config as config_lib
from neddf_tpu.data.synthetic import generate_machine_dataset
from neddf_tpu.geometry.camera import create_rays
from neddf_tpu.geometry.se3 import camera_pose
from neddf_tpu.ops.compositing import integrate_volume_render
from neddf_tpu.ops.sampling import stratified_dists
from neddf_tpu.training.step import make_local_grads

SCENE = str(
    generate_machine_dataset(
        tempfile.mkdtemp(prefix="neddf_camgrad_scene_"),
        n_train=2, n_test=1, image_size=48,
    )
)
atexit.register(shutil.rmtree, SCENE, True)

SMALL_NET = {
    "embed_pos_rank": 4,
    "embed_dir_rank": 2,
    "ddf_layer_count": 4,
    "ddf_layer_width": 16,
    "col_layer_count": 3,
    "col_layer_width": 16,
    "skips": [1],
    "compute_dtype": "float32",
}


def _make_trainer(family: str = "neddf"):
    overrides = ["dataset=test", "trainer=test"]
    if family == "nerf":
        overrides += ["network=nerf", "render=nerf_render", "loss=nerf_loss"]
    cfg = config_lib.compose(
        Path(__file__).resolve().parents[2] / "config", overrides=overrides
    )
    cfg["dataset"]["dataset_dir"] = SCENE
    if family == "nerf":
        cfg["network"].update(
            {
                "embed_pos_rank": 4, "embed_dir_rank": 2,
                "layer_count": 4, "layer_width": 16, "skips": [1],
                "compute_dtype": "float32",
                # smooth activations: ReLU density goes exactly dead on
                # background rays (zero gradient, vacuous FD test) and
                # ReLU kinks break central differences; Softplus keeps
                # the whole chain alive and C^1 — this test checks the
                # CHAIN, not a particular activation
                "activation_type": "Softplus",
                "density_activation_type": "Softplus",
            }
        )
    else:
        cfg["network"].update(SMALL_NET)
    cfg["render"].update({"sample_coarse": 4, "sample_fine": 8})
    cfg["trainer"].update(
        {"batch_size": 64, "chunk": 64, "optimize_camera": True}
    )
    return config_lib.instantiate(cfg["trainer"], global_config=cfg)


def test_pose_chain_gradient_matches_finite_differences():
    """Detach-free pose chain: AD == FD to 2% on all 6 DoF.

    Uses the NeRF family: NeDDF's apply carries reference-faithful
    stop_gradient placements inside the density equation (neddf.py's sg
    sites mirror the reference's .detach()s), which FD sees through but
    AD deliberately omits — on NeRF the chain has no detach anywhere.
    """
    t = _make_trainer("nerf")
    r = t.neural_render
    cam = 0
    initial = t.camera_initials[cam]
    gt = t.rgb_images[cam].astype(jnp.float32) / 256.0
    h_img, w_img = gt.shape[:2]
    key = jax.random.PRNGKey(5)
    us = jax.random.randint(key, (64,), 0, w_img)
    vs = jax.random.randint(jax.random.fold_in(key, 1), (64,), 0, h_img)
    uv = jnp.stack([us, vs], axis=1)
    gt_px = gt[vs, us, :]
    pixel_ids = uv[:, 0] * 65536 + uv[:, 1]
    dists = stratified_dists(
        jax.random.fold_in(key, 2), 64, r.sample_coarse, r.dist_near,
        r.dist_far, pixel_ids=pixel_ids,
    )
    sched = r.network_fine.schedule(100)

    def loss_of(delta):
        pose_r, pose_t = camera_pose(initial, delta)
        rays = create_rays(t.calib, pose_r, pose_t, uv)
        sampling = r._make_sampling(rays, dists)
        values = r.network_fine.apply(
            t.params["network_fine"], sampling, sched
        )
        out = integrate_volume_render(
            dists, values["density"], values["color"], r.max_dist
        )
        return jnp.mean((out["color"] - gt_px) ** 2)

    d0 = jnp.zeros(6)
    g = np.asarray(jax.grad(loss_of)(d0))
    h = 1e-3
    fd = np.array(
        [
            (float(loss_of(d0.at[k].add(h))) - float(loss_of(d0.at[k].add(-h))))
            / (2 * h)
            for k in range(6)
        ]
    )
    assert np.abs(g).max() > 1e-5
    np.testing.assert_allclose(g, fd, rtol=2e-2, atol=2e-5)


def test_product_loss_camera_gradient_consistent_with_fd():
    """Full product step gradient: zero rows for unsampled cameras;
    directionally consistent (cos > 0.95) with full-loss FD. Exact
    equality is impossible by design (fine-resample detach, see module
    docstring) — the exact check lives in the coarse-chain test above."""
    t = _make_trainer()
    lg = make_local_grads(
        t.neural_render, t.loss_functions, t.calib,
        t.dataset.image_width, t.dataset.image_height,
        t.batch_size, grad_accum=1, optimize_camera=True,
    )
    rgb, mask = t.rgb_images, t.mask_images
    key = jax.random.PRNGKey(11)
    cam = 0
    d0 = jnp.zeros_like(t.camera_deltas)

    def loss_of(deltas):
        return float(
            lg(t.params, deltas, rgb, mask, t.camera_initials,
               key, cam, 100, 0, t.batch_size)[0]
        )

    _, _, _, _, grads_cam = lg(
        t.params, d0, rgb, mask, t.camera_initials,
        key, cam, 100, 0, t.batch_size,
    )
    grads_cam = np.asarray(grads_cam)
    other = np.delete(grads_cam, cam, axis=0)
    np.testing.assert_array_equal(other, np.zeros_like(other))

    h = 1e-3
    fd = np.array(
        [
            (loss_of(d0.at[cam, k].add(h)) - loss_of(d0.at[cam, k].add(-h)))
            / (2 * h)
            for k in range(6)
        ]
    )
    g = grads_cam[cam].astype(np.float64)
    cos = float(g @ fd / (np.linalg.norm(g) * np.linalg.norm(fd) + 1e-30))
    assert np.abs(g).max() > 1e-5
    assert cos > 0.95, f"cosine(AD, FD) = {cos:.4f}; gradient chain broken"
