"""Checkpointing: msgpack pytree save/load + torch .pth importer.

The reference saves ``neural_render.state_dict()`` to
``models/model_{epoch:05}.pth`` every 100 epochs (nerf_trainer.py:75-79)
and loads it for eval/visualisation (base_trainer.py:115-121). Here the
native format is a flax msgpack of the full training state (params +
opt_state + iteration + camera deltas — a superset enabling true
mid-training resume, which the reference lacks), and
``import_torch_state_dict`` converts the reference's shipped ``.pth``
(e.g. pretrained/bunny_smoke/models/model_02000.pth) into our parameter
pytree for eval-parity checks.

Key mapping notes: LinearGradLayer stores weight as [in, out]
(with_grad/linear.py:115 ``torch.randn(input_ch, output_ch)``) — no
transpose; plain nn.Linear stores [out, in] — transposed on import.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Union

import jax.numpy as jnp
import numpy as np
from flax import serialization

from neddf_tpu.fields import NeDDF, NeRF, NeuS


def save_pytree(path: Union[str, Path], pytree: Any) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(pytree))


def load_pytree(path: Union[str, Path], template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


class AsyncCheckpointer:
    """Preemption-safe async checkpointing via Orbax (SURVEY §5.3).

    The reference has no preemption story (manual restart from periodic
    .pth saves). On TPU pods preemption is routine, so this wraps
    ``orbax.checkpoint`` with async writes: ``save`` returns immediately
    while the previous save is finalised in the background; ``wait``
    blocks until all pending writes are durable (call before exit).
    Falls back to synchronous msgpack if orbax is unavailable.
    """

    def __init__(self, directory: Union[str, Path]) -> None:
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        try:
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    enable_async_checkpointing=True, max_to_keep=None
                ),
            )
        except Exception:
            self._mgr = None

    def save(self, step: int, state: Any) -> None:
        if self._mgr is None:
            save_pytree(self.directory / f"model_{step:05}.ckpt", state)
            return
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: int, template: Any) -> Any:
        if self._mgr is None:
            return load_pytree(self.directory / f"model_{step:05}.ckpt", template)
        import orbax.checkpoint as ocp

        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Union[int, None]:
        if self._mgr is None:
            steps = sorted(
                int(p.stem.split("_")[1]) for p in self.directory.glob("model_*.ckpt")
            )
            return steps[-1] if steps else None
        return self._mgr.latest_step()

    def wait(self) -> None:
        if self._mgr is not None:
            self._mgr.wait_until_finished()


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _import_neddf(sd: Dict[str, Any], prefix: str, field: NeDDF) -> Dict[str, Any]:
    def grad_linear(name: str) -> Dict[str, jnp.ndarray]:
        return {
            "w": jnp.asarray(_np(sd[f"{prefix}.{name}.weight"])),  # already [in, out]
            "b": jnp.asarray(_np(sd[f"{prefix}.{name}.bias"])),
        }

    return {
        "layers_ddf": [
            grad_linear(f"layers_ddf.{i}") for i in range(field.ddf_layer_count - 1)
        ],
        "layers_col": [
            grad_linear(f"layers_col.{i}") for i in range(field.col_layer_count - 1)
        ],
        "layer_ddf_out": grad_linear("layer_ddf_out"),
        "layer_aux_out": grad_linear("layer_aux_out"),
        "layer_col_out": grad_linear("layer_col_out"),
    }


def _import_nerf(sd: Dict[str, Any], prefix: str, field: NeRF) -> Dict[str, Any]:
    def torch_linear(name: str) -> Dict[str, jnp.ndarray]:
        return {
            # [out,in] -> [in,out]
            "w": jnp.asarray(_np(sd[f"{prefix}.{name}.weight"]).T),
            "b": jnp.asarray(_np(sd[f"{prefix}.{name}.bias"])),
        }

    return {
        "layers": [torch_linear(f"layers.{i}") for i in range(field.layer_count)],
        "outL_density": torch_linear("outL_density"),
        # Sequential(Linear, ReLU, Linear) -> module indices 0 and 2
        "outL_color": [torch_linear("outL_color.0"), torch_linear("outL_color.2")],
    }


def _import_neus(sd: Dict[str, Any], prefix: str, field: NeuS) -> Dict[str, Any]:
    def torch_linear(name: str) -> Dict[str, jnp.ndarray]:
        return {
            "w": jnp.asarray(_np(sd[f"{prefix}.{name}.weight"]).T),
            "b": jnp.asarray(_np(sd[f"{prefix}.{name}.bias"])),
        }

    return {
        "layers_sdf": [
            torch_linear(f"layers_sdf.{i}") for i in range(field.sdf_layer_count)
        ],
        "layers_col": [
            torch_linear(f"layers_col.{i}") for i in range(field.col_layer_count + 1)
        ],
        "variance": jnp.asarray(_np(sd[f"{prefix}.variance"])),
    }


def import_torch_state_dict(
    pth_path: Union[str, Path], renderer: Any
) -> Dict[str, Any]:
    """Convert a reference NeRFRender state_dict (.pth) to our params."""
    import torch

    sd = torch.load(str(pth_path), map_location="cpu")
    importers = {NeDDF: _import_neddf, NeRF: _import_nerf, NeuS: _import_neus}

    def import_net(prefix: str, field) -> Dict[str, Any]:
        return importers[type(field)](sd, prefix, field)

    params = {"network_fine": import_net("network_fine", renderer.network_fine)}
    if renderer.use_coarse_network:
        params["network_coarse"] = import_net(
            "network_coarse", renderer.network_coarse
        )
    return params


# ------------------------------------------------- .pth export (inverse)
#
# The reverse direction of the importer above: write our parameter
# pytree as a reference-layout ``state_dict`` so a TPU-trained model can
# be evaluated/visualised with the PyTorch reference's own tooling
# (run_eval.py / fields_visualizer.py consume these via
# base_trainer.py:115-121). Layouts mirror the import notes exactly:
# LinearGradLayer weights stay [in, out]; plain nn.Linear transpose back
# to [out, in].


def _export_neddf(params: Dict[str, Any], prefix: str, field: NeDDF, sd) -> None:
    def grad_linear(name: str, leaf: Dict[str, Any]) -> None:
        sd[f"{prefix}.{name}.weight"] = np.asarray(leaf["w"], np.float32)
        sd[f"{prefix}.{name}.bias"] = np.asarray(leaf["b"], np.float32)

    for i, leaf in enumerate(params["layers_ddf"]):
        grad_linear(f"layers_ddf.{i}", leaf)
    for i, leaf in enumerate(params["layers_col"]):
        grad_linear(f"layers_col.{i}", leaf)
    grad_linear("layer_ddf_out", params["layer_ddf_out"])
    grad_linear("layer_aux_out", params["layer_aux_out"])
    grad_linear("layer_col_out", params["layer_col_out"])


def _export_nerf(params: Dict[str, Any], prefix: str, field: NeRF, sd) -> None:
    def torch_linear(name: str, leaf: Dict[str, Any]) -> None:
        sd[f"{prefix}.{name}.weight"] = np.asarray(leaf["w"], np.float32).T
        sd[f"{prefix}.{name}.bias"] = np.asarray(leaf["b"], np.float32)

    for i, leaf in enumerate(params["layers"]):
        torch_linear(f"layers.{i}", leaf)
    torch_linear("outL_density", params["outL_density"])
    torch_linear("outL_color.0", params["outL_color"][0])
    torch_linear("outL_color.2", params["outL_color"][1])


def _export_neus(params: Dict[str, Any], prefix: str, field: NeuS, sd) -> None:
    def torch_linear(name: str, leaf: Dict[str, Any]) -> None:
        sd[f"{prefix}.{name}.weight"] = np.asarray(leaf["w"], np.float32).T
        sd[f"{prefix}.{name}.bias"] = np.asarray(leaf["b"], np.float32)

    for i, leaf in enumerate(params["layers_sdf"]):
        torch_linear(f"layers_sdf.{i}", leaf)
    for i, leaf in enumerate(params["layers_col"]):
        torch_linear(f"layers_col.{i}", leaf)
    sd[f"{prefix}.variance"] = np.asarray(params["variance"], np.float32)


def export_torch_state_dict(
    params: Dict[str, Any], renderer: Any, pth_path: Union[str, Path]
) -> None:
    """Write our params as a reference-layout ``.pth`` state_dict.

    When the renderer shares one network (``use_coarse_network=False``)
    the reference's module tree still contains BOTH prefixes — its
    ``network_coarse`` is the same module object as ``network_fine``
    (nerf_render.py:75) — so the fine tensors are written under both,
    making the file strict-``load_state_dict`` compatible.
    """
    import torch

    exporters = {NeDDF: _export_neddf, NeRF: _export_nerf, NeuS: _export_neus}
    sd_np: Dict[str, np.ndarray] = {}
    fine = renderer.network_fine
    exporters[type(fine)](params["network_fine"], "network_fine", fine, sd_np)
    if renderer.use_coarse_network:
        coarse = renderer.network_coarse
        exporters[type(coarse)](
            params["network_coarse"], "network_coarse", coarse, sd_np
        )
    else:
        exporters[type(fine)](params["network_fine"], "network_coarse", fine, sd_np)

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
    Path(pth_path).parent.mkdir(parents=True, exist_ok=True)
    torch.save(sd, str(pth_path))
