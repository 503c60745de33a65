"""Trainers: device-staged data, jitted train step, epoch hooks.

Behavioural twin of neddf/trainer/{base_trainer.py,nerf_trainer.py} with
the host/device split redesigned for TPU:

* the whole image stack is staged to device ONCE at startup; per-step
  ground-truth pixels are a device-side gather inside the jitted step
  (the reference gathers in numpy per step, base_trainer.py:224-240 —
  a guaranteed H2D stall).
* one jitted train step fuses pixel sampling, ray generation, both field
  evaluations, compositing, losses, backward, and the Adam update.
* warmup counters and the per-epoch ExponentialLR (gamma=0.99815) are
  schedules of the iteration index — no Python-side mutation.
* checkpoints carry params + opt_state + iteration + camera deltas, a
  superset of the reference's weights-only .pth enabling true resume.
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neddf_tpu import config as config_lib
from neddf_tpu.geometry.camera import PinholeCalib
from neddf_tpu.geometry.se3 import camera_pose
from neddf_tpu.training.checkpoint import (
    import_torch_state_dict,
    load_pytree,
    save_pytree,
)
from neddf_tpu.training.logger import NeRFTBLogger
from neddf_tpu.training.metrics import peak_signal_noise_ratio, structural_similarity
from neddf_tpu.training.optim import row_sparse_adam
from neddf_tpu.training.step import construct_targets, make_local_grads

Array = jax.Array


def _pose_grad_accum_guard(
    optimize_camera: bool, grad_accum: int, local_batch: int, platform: str
) -> "int | None":
    """grad_accum the pose-grad guard requires, or None to keep as-is.

    See the guard note in ``BaseTrainer.__init__``: the monolithic
    optimize_camera grad program faults the v5e worker, so off-CPU it
    must run as >=2 lax.scan microbatches (smallest divisor of the
    local batch). CPU (jnp field path) is clean and keeps the exact
    grad_accum=1 trajectory its calibrated capability tests pin.
    """
    if not optimize_camera or grad_accum != 1 or local_batch <= 1:
        return None
    if platform == "cpu":
        return None
    need = 2
    while local_batch % need:
        need += 1
    return need


def _resolve_device(device: str):
    """Map the reference's device strings onto available JAX devices.

    ``cpu`` selects the host platform even when the process default is a
    TPU backend (useful for the offline visualizers, where tunnelled-TPU
    compile latency dwarfs the compute) — this only works if JAX has not
    initialised its backends yet, so trainers resolve the device first
    thing.
    """
    if device.startswith("cpu"):
        try:
            return jax.devices("cpu")[0]
        except RuntimeError:
            pass
        try:
            jax.config.update("jax_platforms", "cpu")
            return jax.devices("cpu")[0]
        except Exception:
            return jax.devices()[0]
    return jax.devices()[0]


class BaseTrainer:
    def __init__(
        self,
        global_config: Dict[str, Any],
        device: str = "cuda:0",
        batch_size: int = 1024,
        chunk: int = 1024,
        epoch_max: int = 2000,
        epoch_save_fields: int = 2,
        epoch_test_rendering: int = 10,
        epoch_save_model: int = 100,
        scheduler_lr: float = 0.99815,
        optimizer_lr: float = 0.0005,
        optimizer_weight_decay: float = 0.0,
        seed: int = 3408,
        debug_nans: bool = False,
        profile_trace_start: int = -1,
        profile_trace_steps: int = 5,
        log_interval: int = 1,
        optimize_camera: bool = False,
        camera_optimizer_lr: float = 1e-4,
        async_checkpoint: bool = False,
        grad_accum: int = 1,
        mesh: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.config = global_config
        self.device = _resolve_device(device)
        # multi-device training: mesh={"data": "auto"|N, "model": M}.
        # data="auto" uses every local device (divided by model); a
        # resolved 1x1 mesh degenerates to the single-device jit path,
        # so "auto" is safe as a production default on one chip.
        self.mesh = self._resolve_mesh(mesh)
        self._n_data = self.mesh.shape["data"] if self.mesh is not None else 1
        self._n_model = self.mesh.shape["model"] if self.mesh is not None else 1
        if batch_size % self._n_data:
            raise ValueError(
                f"batch_size={batch_size} not divisible by mesh data axis "
                f"{self._n_data}"
            )
        self.batch_size = batch_size
        if self.mesh is not None:
            # eval-render chunks are always padded to exactly `chunk`
            # rays; the sharded render splits them over every device
            total = self._n_data * self._n_model
            chunk = -(-chunk // total) * total
        self.chunk = chunk
        self.epoch_max = epoch_max
        self.epoch_save_fields = epoch_save_fields
        self.epoch_test_rendering = epoch_test_rendering
        self.epoch_save_model = epoch_save_model
        self.scheduler_lr = scheduler_lr
        self.optimizer_lr = optimizer_lr
        self.optimizer_weight_decay = optimizer_weight_decay
        self.seed = seed
        # fetch step metrics from device every N steps: a per-step
        # float(loss) blocks the async dispatch pipeline and costs a full
        # tunnel round-trip; with N>1 the device stays busy and metrics
        # arrive in batches (the reference syncs every step)
        self.log_interval = max(1, int(log_interval))
        self._pending_logs: List[Any] = []
        self._pending_durations: List[float] = []
        # opt-in whole-ray occupancy culling for eval renders (set via
        # enable_ray_cull, e.g. run_eval --ray-cull)
        self.eval_ray_cull: Optional[Any] = None
        self._last_loss = float("nan")
        # pose refinement: the reference exposes each Camera's 6-DoF delta
        # as an nn.Parameter (camera.py:40) but its default optimizer only
        # covers network params (nerf_render.py:94-107). Here the deltas
        # become a real optimizer target when enabled.
        self.optimize_camera = optimize_camera
        self.camera_optimizer_lr = camera_optimizer_lr
        # preemption-safe async checkpointing (orbax): saves return
        # immediately; run_train waits for pending writes at the end
        self.async_checkpoint = async_checkpoint
        self._async_ckpt = None
        self._sharded_render = None
        # gradient accumulation: split each step's ray batch into
        # ``grad_accum`` sequential microbatches inside one jitted step
        # (lax.scan) and average the gradients. Numerically equivalent to
        # the monolithic step — losses are per-ray means over equal-size
        # microbatches, and the per-PIXEL RNG derivation (ops/sampling.py)
        # makes the sample draws independent of the batch split. Use it to
        # (a) bound activation memory at large ray batches and (b) keep
        # every compiled grad program at a scale XLA handles correctly
        # (B=4096 monolithic grad programs miscompile on current v5e
        # toolchains — kernels/dual_mlp.py docstring).
        local_batch = batch_size // self._n_data
        if grad_accum < 1 or local_batch % grad_accum:
            raise ValueError(
                f"grad_accum={grad_accum} must divide the per-device batch "
                f"{local_batch} (batch_size={batch_size} / data={self._n_data})"
            )
        self.grad_accum = int(grad_accum)
        # guard the documented XLA failure regime: monolithic grad
        # programs above 2048 rays miscompile (NaNs) or compile-OOM on
        # current v5e toolchains (kernels/dual_mlp.py docstring;
        # minimized repro: tools/repro_grad_nan.py). The per-PROGRAM ray
        # count is the per-device microbatch, so keep it within the
        # verified scale by auto-raising grad_accum to the smallest
        # divisor of the local batch that does — numerically equivalent
        # (see the grad_accum note above), so no user config can reach
        # the bad program shape.
        _MAX_MONOLITHIC_RAYS = 2048
        if local_batch // self.grad_accum > _MAX_MONOLITHIC_RAYS:
            need = self.grad_accum
            while local_batch % need or local_batch // need > _MAX_MONOLITHIC_RAYS:
                need += 1
            print(
                f"[trainer] per-device batch {local_batch} with grad_accum="
                f"{self.grad_accum} exceeds the verified {_MAX_MONOLITHIC_RAYS}"
                f"-ray monolithic grad regime; raising grad_accum to {need} "
                "(equivalent step; kernels/dual_mlp.py docstring)"
            )
            self.grad_accum = need

        # second documented v5e failure regime (2026-08-20, minimized by
        # A/B on the real chip): the MONOLITHIC grad program with
        # optimize_camera=true (loss differentiated w.r.t. the camera
        # deltas THROUGH the fused Pallas field kernels) crashes the TPU
        # worker ("kernel fault") at the flagship scale — deterministic,
        # epilogue/stash-toggle-invariant, absent on the jnp field path
        # and absent under lax.scan microbatching, so it is an XLA-level
        # program-scale fault like the B=4096 one above. grad_accum>=2
        # is the exactly-equivalent shipped mitigation (same note above);
        # auto-raise so trainer.optimize_camera=true works out of the box.
        # TPU-only: the fault is in the v5e backend's compilation of the
        # fused-kernel pose-grad program; the CPU/jnp path is clean with
        # grad_accum=1 (and CPU-calibrated capability tests rely on the
        # exact grad_accum=1 trajectory).
        need = _pose_grad_accum_guard(
            self.optimize_camera, self.grad_accum, local_batch,
            self.device.platform,
        )
        if need is not None:
            print(
                "[trainer] optimize_camera=true: raising grad_accum to "
                f"{need} — the monolithic pose-gradient program faults "
                "the v5e TPU worker (equivalent step; see trainer.py "
                "guard note)"
            )
            self.grad_accum = need

        # numerical sanitizer (reference: set_detect_anomaly at run.py:39)
        if debug_nans:
            from neddf_tpu.utils.profiling import enable_nan_debugging

            enable_nan_debugging(True)
        from neddf_tpu.utils.profiling import StepProfiler

        self.profiler = StepProfiler(
            rays_per_step=batch_size,
            trace_dir="log/profile" if profile_trace_start >= 0 else None,
            trace_start=profile_trace_start,
            trace_steps=profile_trace_steps,
        )

        # dataset (host) + device staging
        self.dataset = config_lib.instantiate(self.config["dataset"])
        put = self._put
        self.calib = PinholeCalib(
            put(self.dataset.camera_calib_params.astype(np.float32))
        )
        self.camera_initials = put(self.dataset.camera_params.astype(np.float32))
        self.camera_deltas = put(
            np.zeros_like(self.dataset.camera_params, dtype=np.float32)
        )
        self.rgb_images = put(self.dataset.rgb_images.astype(np.float32))
        self.mask_images = put(self.dataset.mask_images.astype(np.float32))

        # losses
        self.loss_functions = [
            config_lib.instantiate(fn) for fn in self.config["loss"]["functions"]
        ]
        self.loss_types = [fn.key_target for fn in self.loss_functions]

    # --------------------------------------------------------------- mesh
    def _resolve_mesh(self, mesh_cfg: Optional[Dict[str, Any]]):
        """Resolve the ``mesh`` config into a jax Mesh (or None).

        ``data: auto`` spans every device of the trainer's platform; a
        1x1 result returns None so the single-device jit path (bitwise
        identical to the no-mesh trainer) is used.
        """
        if not mesh_cfg:
            return None
        model = int(mesh_cfg.get("model", 1))
        data = mesh_cfg.get("data", "auto")
        devices = jax.devices(self.device.platform)
        if data in ("auto", "max", None, -1):
            data = max(1, len(devices) // model)
        data = int(data)
        if data * model == 1:
            return None
        if data * model > len(devices):
            raise ValueError(
                f"mesh {data}x{model} needs {data * model} devices; "
                f"platform {self.device.platform!r} has {len(devices)}"
            )
        from neddf_tpu.parallel.mesh import make_mesh

        return make_mesh(data * model, model=model, devices=devices)

    def _put(self, x):
        """Stage a host array or pytree: replicated over the mesh, or on
        the single device."""
        x = jax.tree_util.tree_map(jnp.asarray, x)
        if self.mesh is not None:
            from neddf_tpu.parallel.mesh import replicated

            return jax.device_put(x, replicated(self.mesh))
        return jax.device_put(x, self.device)

    def _place_params(self, tree):
        """Place a params-shaped pytree: TP width shards (degenerating to
        replication at model=1) over the mesh, or on the single device.
        The spec rule is shape-based, so it applies equally to optimizer
        state whose mu/nu leaves mirror the params."""
        if self.mesh is not None:
            from neddf_tpu.parallel.mesh import shard_field_params

            return shard_field_params(tree, self.mesh)
        return jax.device_put(tree, self.device)

    # ------------------------------------------------------------- cameras
    def camera_pose_np(self, camera_id: int) -> tuple:
        r, t = camera_pose(
            self.camera_initials[camera_id], self.camera_deltas[camera_id]
        )
        return r, t

    # ------------------------------------------------------------- targets
    def construct_ground_truth(
        self, rgb_cam: Array, mask_cam: Array, us: Array, vs: Array
    ) -> Dict[str, Array]:
        """Device-side GT gather (reference: base_trainer.py:206-245)."""
        return construct_targets(self.loss_types, rgb_cam, mask_cam, us, vs)

    # --------------------------------------------------------------- eval
    def load_pretrained_model(self, model_path: "str | Path") -> None:
        model_path = Path(model_path)
        if model_path.suffix == ".pth":
            self.params = import_torch_state_dict(model_path, self.neural_render)
        else:
            from flax import serialization

            # template-less msgpack restore turns lists into string-keyed
            # dicts; re-impose the live params structure
            state = load_pytree(model_path, None)
            raw = state["params"] if "params" in state else state
            self.params = serialization.from_state_dict(self.params, raw)
            self.params = jax.tree_util.tree_map(jnp.asarray, self.params)
        self.params = self._place_params(jax.device_get(self.params))

    def enable_ray_cull(
        self, resolution: int = 64, threshold: float = 0.01
    ) -> None:
        """Skip background rays in eval renders: build an occupancy grid
        from the CURRENT field and cull whole rays that never cross
        occupied space (render/renderer.py::render_image ray_cull)."""
        params = self.params
        if self.mesh is not None and self._n_model > 1:
            # width-sharded params must not reach field.apply outside the
            # shard_map tp_gather path (same GSPMD hazard documented in
            # render_field_slices); the 64^3 probe is tiny — run on host
            params = jax.tree_util.tree_map(
                jnp.asarray, jax.device_get(self.params)
            )
        self.eval_ray_cull = self.neural_render.build_occupancy(
            params, jax.random.PRNGKey(self.seed),
            resolution=resolution, threshold=threshold,
        )

    def _eval_render_fn(self):
        """Mesh-sharded eval render: pixel chunks shard over every device
        and the rendered tiles all-gather back (BASELINE.json design).
        None on a single device — render_image then uses its own jit."""
        if self.mesh is None:
            return None
        if self._sharded_render is None:
            from neddf_tpu.parallel.mesh import make_sharded_render

            sharded = make_sharded_render(
                self.neural_render, self.calib, self.mesh
            )
            self._sharded_render = (
                lambda params, calib, r, t, uv, key: sharded(params, r, t, uv, key)
            )
        return self._sharded_render

    def render_test(
        self, output_dir: Path, camera_id: int, downsampling: int = 1
    ) -> None:
        import cv2

        rgb_gt = np.asarray(self.dataset[camera_id]["rgb_images"]).astype(np.uint8)
        h, w = rgb_gt.shape[:2]
        r, t = self.camera_pose_np(camera_id)
        images = self.neural_render.render_image(
            self.params, self.calib, r, t, w, h,
            ["color", "depth"], downsampling, self.chunk,
            render_fn=self._eval_render_fn(),
            ray_cull=self.eval_ray_cull,
        )
        rgb_np = np.clip(images["color"] * 255, 0, 255).astype(np.uint8)
        depth_np = np.clip(
            (images["depth"][:, :, 0] - 2.0) / 4.0 * 50000 / 256, 0, 255
        ).astype(np.uint8)

        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(output_dir / f"{camera_id:03}_rgb.png"), rgb_np)
        cv2.imwrite(str(output_dir / f"{camera_id:03}_rgb_gt.png"), rgb_gt)
        cv2.imwrite(str(output_dir / f"{camera_id:03}_depth.png"), depth_np)

        if downsampling == 1:
            psnr = peak_signal_noise_ratio(rgb_np, rgb_gt)
            ssim = structural_similarity(rgb_np, rgb_gt, channel_axis=2)
            print(f"psnr: {psnr}, ssim: {ssim}")

    def render_all(self, output_dir: Path) -> None:
        for camera_id in range(len(self.dataset)):
            print(f"rendering from camera {camera_id}")
            self.render_test(output_dir, camera_id, 1)

    def render_field_slices(self, output_field_dir: Path, epoch: int = 0) -> None:
        import cv2

        params = self.params
        if self.mesh is not None and self.mesh.shape["model"] > 1:
            # width-sharded params must not reach the GSPMD partitioner
            # (documented CPU TP miscompile, parallel/mesh.py): gather to
            # host and run the tiny 128^2 slice program unsharded
            params = jax.tree_util.tree_map(
                jnp.asarray, jax.device_get(self.params)
            )
        images = self.neural_render.render_field_slice(params)
        output_field_dir = Path(output_field_dir)
        output_field_dir.mkdir(parents=True, exist_ok=True)
        for key, img in images.items():
            cv2.imwrite(str(output_field_dir / f"field_{key}_{epoch:04}.png"), img)


class NeRFTrainer(BaseTrainer):
    """Concrete trainer (reference: nerf_trainer.py:16-140)."""

    def __init__(self, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.neural_render = config_lib.instantiate(
            self.config["render"], network_config=self.config["network"]
        )
        self.key = jax.random.PRNGKey(self.seed)
        self.key, init_key = jax.random.split(self.key)
        with jax.default_device(self.device):
            self.params = self.neural_render.init(init_key)
        # mesh placement: replicated for DP, width-sharded for TP
        self.params = self._place_params(self.params)

        # per-EPOCH ExponentialLR expressed over iterations (staircase)
        frame_length = max(len(self.dataset), 1)
        lr_schedule = optax.exponential_decay(
            init_value=self.optimizer_lr,
            transition_steps=frame_length,
            decay_rate=self.scheduler_lr,
            staircase=True,
        )
        # torch Adam's weight_decay is L2-into-gradient (not decoupled)
        parts = []
        if self.optimizer_weight_decay:
            parts.append(optax.add_decayed_weights(self.optimizer_weight_decay))
        parts += [
            optax.scale_by_adam(eps=1e-8),
            optax.scale_by_learning_rate(lr_schedule),
        ]
        self.tx = optax.chain(*parts)
        with jax.default_device(self.device):
            self.opt_state = self.tx.init(self.params)
        # per-camera deltas get ROW-SPARSE Adam: each step's gradient
        # touches one camera row, and plain Adam keeps pushing absent
        # rows with stale momentum (~1/(1-b1) x lr per real gradient) —
        # training/optim.py for the derivation
        self.tx_cam = row_sparse_adam(self.camera_optimizer_lr)
        with jax.default_device(self.device):
            self.opt_state_cam = self.tx_cam.init(self.camera_deltas)

        self.iteration = 0
        self.logger = NeRFTBLogger()
        # THE step implementation is training/step.py::make_local_grads,
        # shared verbatim between this single-device jit and the
        # shard_map mesh path (VERDICT r2 item 1: one implementation)
        if self.mesh is not None:
            self._train_step = self._make_mesh_train_step()
        else:
            self._local_grads = make_local_grads(
                self.neural_render, self.loss_functions, self.calib,
                self.dataset.image_width, self.dataset.image_height,
                self.batch_size, self.grad_accum, self.optimize_camera,
            )
            self._train_step = jax.jit(
                self._train_step_impl, donate_argnums=(0, 1, 2, 3)
            )

    # ----------------------------------------------------------- train step
    def _apply_updates(
        self, params, opt_state, camera_deltas, opt_state_cam, grads, grads_cam
    ):
        """Optimizer updates shared by the single-device and mesh steps."""
        if self.optimize_camera:
            cam_updates, opt_state_cam = self.tx_cam.update(
                grads_cam, opt_state_cam, camera_deltas
            )
            camera_deltas = optax.apply_updates(camera_deltas, cam_updates)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, camera_deltas, opt_state_cam

    def _train_step_impl(
        self,
        params,
        opt_state,
        camera_deltas: Array,
        opt_state_cam,
        rgb_images: Array,
        mask_images: Array,
        camera_initials: Array,
        key: Array,
        camera_id: Array,
        iteration: Array,
    ):
        # NOTE: image stacks are real arguments, not closure captures — a
        # closed-over stack would be baked into the program as hundreds of
        # MB of constants (and overflow remote-compile transports).
        loss, loss_dict, mse, grads, grads_cam = self._local_grads(
            params, camera_deltas, rgb_images, mask_images, camera_initials,
            key, camera_id, iteration, 0, self.batch_size,
        )
        params, opt_state, camera_deltas, opt_state_cam = self._apply_updates(
            params, opt_state, camera_deltas, opt_state_cam, grads, grads_cam
        )
        return params, opt_state, camera_deltas, opt_state_cam, loss, loss_dict, mse

    def _make_mesh_train_step(self):
        """Full trainer step over the mesh: the SAME local_grads as the
        single-device path wrapped in shard_map (parallel/mesh.py), with
        every trainer feature — grad_accum microbatches run inside each
        device's program, camera-pose gradients are pmean-reassembled,
        loss_dict metrics replicate — then the shared optimizer update."""
        from neddf_tpu.parallel.mesh import make_sharded_grads, tp_renderer

        renderer = (
            tp_renderer(self.neural_render)
            if self._n_model > 1
            else self.neural_render
        )
        local_grads = make_local_grads(
            renderer, self.loss_functions, self.calib,
            self.dataset.image_width, self.dataset.image_height,
            self.batch_size, self.grad_accum, self.optimize_camera,
        )
        grads_fn = make_sharded_grads(self.mesh, local_grads, self.batch_size)

        def train_step(params, opt_state, camera_deltas, opt_state_cam,
                       rgb_images, mask_images, camera_initials, key,
                       camera_id, iteration):
            loss, loss_dict, mse, grads, grads_cam = grads_fn(
                params, camera_deltas, rgb_images, mask_images,
                camera_initials, key, camera_id, iteration,
            )
            params, opt_state, camera_deltas, opt_state_cam = (
                self._apply_updates(
                    params, opt_state, camera_deltas, opt_state_cam,
                    grads, grads_cam,
                )
            )
            return (
                params, opt_state, camera_deltas, opt_state_cam,
                loss, loss_dict, mse,
            )

        return jax.jit(train_step, donate_argnums=(0, 1, 2, 3))

    def run_train_step(self, camera_id: int) -> float:
        self.logger.write_batchstart()
        self.profiler.step_begin()
        self.key, step_key = jax.random.split(self.key)
        (
            self.params,
            self.opt_state,
            self.camera_deltas,
            self.opt_state_cam,
            loss,
            loss_dict,
            mse,
        ) = self._train_step(
            self.params,
            self.opt_state,
            self.camera_deltas,
            self.opt_state_cam,
            self.rgb_images,
            self.mask_images,
            self.camera_initials,
            step_key,
            jnp.int32(camera_id),
            jnp.int32(self.iteration),
        )
        self.iteration += 1
        self._pending_logs.append((loss, loss_dict, mse))
        do_flush = len(self._pending_logs) >= self.log_interval
        if do_flush:
            # device sync BEFORE closing this step's timing window so
            # rays/sec measures sustained throughput, not dispatch rate
            fetched = jax.device_get(self._pending_logs)
        self.profiler.step_end()
        self.logger.write_batchend()
        self._pending_durations.append(
            self.logger.batchend - self.logger.batchstart
        )
        if do_flush:
            self._last_loss = self._emit_records(fetched, self._pending_durations)
            self._pending_logs, self._pending_durations = [], []
        # between flushes, return the last materialised loss (stale by up
        # to log_interval-1 steps; log_interval=1 syncs every step like
        # the reference)
        return self._last_loss

    def _flush_logs(self) -> float:
        """Materialise pending device metrics and emit logger records."""
        if not self._pending_logs:
            return self._last_loss
        fetched = jax.device_get(self._pending_logs)
        self._last_loss = self._emit_records(fetched, self._pending_durations)
        self._pending_logs, self._pending_durations = [], []
        return self._last_loss

    def _emit_records(self, fetched, durations) -> float:
        # under async dispatch, per-step wall times are dispatch latencies
        # except the sync-bearing step; the batch TOTAL is accurate, so
        # log the uniform amortized duration per step
        if durations:
            mean_dur = sum(durations) / len(durations)
            durations = [mean_dur] * len(durations)
        loss_f = self._last_loss
        for (loss, loss_dict, mse), duration in zip(fetched, durations):
            loss_f = float(loss)
            mse_f = float(mse)
            psnr = 10 * math.log10(1.0 / max(mse_f, 1e-12))
            self.logger.write(
                loss_f,
                psnr,
                {k: float(v) for k, v in loss_dict.items()},
                rays_per_sec=self.profiler.rays_per_sec(),
                duration=duration,
            )
            self.logger.next()
        return loss_f

    # ----------------------------------------------------------- train loop
    def run_train(self) -> None:
        Path("models").mkdir(parents=True, exist_ok=True)
        render_dir = Path("render")

        frame_length = len(self.dataset)
        rng = np.random.default_rng(self.seed)
        # resume support: skip completed epochs, drawing their camera
        # permutations anyway so the RNG stream matches an uninterrupted run
        start_epoch = self.iteration // max(frame_length, 1)
        for epoch in range(0, self.epoch_max + 1):
            camera_ids = rng.permutation(frame_length)
            if epoch < start_epoch:
                continue
            print("epoch: ", epoch)
            for camera_id in camera_ids:
                self.run_train_step(int(camera_id))
            self._flush_logs()
            if epoch % self.epoch_save_fields == 0:
                self.render_field_slices(render_dir / "fields", epoch)
            if epoch % self.epoch_test_rendering == 0:
                print("test rendering...")
                self.render_test(render_dir / f"{epoch:04}", int(camera_ids[0]), 3)
            if epoch % self.epoch_save_model == 0:
                self.save_checkpoint(Path("models") / f"model_{epoch:05}.ckpt")
        self.finalize_checkpoints()

    # ----------------------------------------------------------- checkpoint
    def _state_dict(self):
        return {
            "params": jax.device_get(self.params),
            "opt_state": jax.device_get(self.opt_state),
            "iteration": self.iteration,
            "camera_deltas": jax.device_get(self.camera_deltas),
            "opt_state_cam": jax.device_get(self.opt_state_cam),
            "key": jax.device_get(self.key),
        }

    def save_checkpoint(self, path: Path) -> None:
        path = Path(path)
        if self.async_checkpoint:
            from neddf_tpu.training.checkpoint import AsyncCheckpointer

            if self._async_ckpt is None:
                self._async_ckpt = AsyncCheckpointer(path.parent)
            # step index from the reference-style file name model_{N}.ckpt;
            # arbitrary names fall back to the current iteration
            try:
                step = int(path.stem.split("_")[-1])
            except ValueError:
                step = self.iteration
            self._async_ckpt.save(step, self._state_dict())
            return
        save_pytree(path, self._state_dict())

    def finalize_checkpoints(self) -> None:
        """Block until pending async checkpoint writes are durable."""
        if self._async_ckpt is not None:
            self._async_ckpt.wait()

    def load_checkpoint(self, path: Path) -> None:
        path = Path(path)
        template = {
            "params": jax.device_get(self.params),
            "opt_state": jax.device_get(self.opt_state),
            "iteration": 0,
            "camera_deltas": jax.device_get(self.camera_deltas),
            "opt_state_cam": jax.device_get(self.opt_state_cam),
            "key": jax.device_get(self.key),
        }
        if not path.exists() and path.parent.is_dir():
            # orbax (async) layout: models/<step>/ directories; probe the
            # filesystem first so a typo'd path doesn't construct managers
            steps = sorted(
                int(p.name) for p in path.parent.iterdir() if p.name.isdigit()
            )
            if steps:
                from neddf_tpu.training.checkpoint import AsyncCheckpointer

                # honor a step encoded in the requested file name
                # (model_{N:05}.ckpt) when that step exists; else newest
                try:
                    want = int(path.stem.split("_")[-1])
                except ValueError:
                    want = None
                step = want if want in steps else steps[-1]
                mgr = AsyncCheckpointer(path.parent)
                state = mgr.restore(step, template)
                mgr.wait()
                self._apply_checkpoint_state(state)
                return
        try:
            state = load_pytree(path, template)
        except (KeyError, ValueError):
            # legacy checkpoints predate opt_state_cam (or carry a
            # structurally different one, e.g. optax.adam state from
            # before row_sparse_adam); restore every field that IS
            # structurally compatible — in particular the RNG key, so a
            # mid-run watchdog resume across the optimizer upgrade keeps
            # RNG continuity — and log exactly what was reset
            state = dict(template)
            restored = []
            for k in ("params", "opt_state", "iteration",
                      "camera_deltas", "key"):
                try:
                    state.update(load_pytree(path, {k: template[k]}))
                    restored.append(k)
                except (KeyError, ValueError):
                    pass
            reset = sorted(set(template) - set(restored))
            print(
                f"[checkpoint] legacy restore of {path.name}: "
                f"restored {restored}; reset to fresh: {reset}"
            )
        self._apply_checkpoint_state(state)

    def _apply_checkpoint_state(self, state) -> None:
        self.params = self._place_params(state["params"])
        self.opt_state = self._place_params(state["opt_state"])
        self.iteration = int(state["iteration"])
        self.camera_deltas = self._put(state["camera_deltas"])
        self.opt_state_cam = self._put(state["opt_state_cam"])
        self.key = jnp.asarray(state["key"])
