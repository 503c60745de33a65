"""Hydra-compatible YAML config composition and instantiation.

The reference (ueda0319/neddf) drives everything through Hydra 1.2:
``config/config.yaml`` composes five groups (dataset/render/network/
trainer/loss), every YAML carries ``_target_`` for
``hydra.utils.instantiate``, and the run dir snapshots ``.hydra/`` so
evaluation can recompose the exact config
(/root/reference/neddf/scripts/run_eval.py:22-29).

Hydra is not available in this environment, so this module provides a
small, dependency-free equivalent with the same *user-facing surface*:

* ``compose(config_dir, overrides=[...])`` — reads ``config.yaml``'s
  ``defaults`` list, loads each group file, applies CLI-style overrides
  (``dataset=test`` to swap a group file, ``dataset.dataset_dir=...`` to
  set a leaf).
* ``instantiate(cfg, **extra)`` — imports the ``_target_`` dotted path
  and calls it with the remaining keys.  Reference target names
  (``neddf.xxx.Yyy``) are transparently remapped to ``neddf_tpu``
  equivalents so ``.hydra`` snapshots written by the *reference* can be
  consumed directly (e.g. /root/reference/pretrained/bunny_smoke/.hydra).
* ``save_snapshot(cfg, overrides, run_dir)`` — writes
  ``run_dir/.hydra/{config,overrides}.yaml`` like Hydra does.
"""
from __future__ import annotations

import copy
import importlib
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import yaml

# Reference `_target_` paths -> neddf_tpu import paths. Keys cover every
# _target_ appearing in /root/reference/config/**/*.yaml so reference
# .hydra snapshots can be recomposed unchanged.
_TARGET_ALIASES: Dict[str, str] = {
    "neddf.dataset.NeRFSyntheticDataset": "neddf_tpu.data.NeRFSyntheticDataset",
    "neddf.network.NeDDF": "neddf_tpu.fields.NeDDF",
    "neddf.network.NeRF": "neddf_tpu.fields.NeRF",
    "neddf.network.NeuS": "neddf_tpu.fields.NeuS",
    "neddf.render.NeRFRender": "neddf_tpu.render.NeRFRender",
    "neddf.trainer.NeRFTrainer": "neddf_tpu.training.NeRFTrainer",
    "neddf.loss.ColorLoss": "neddf_tpu.training.ColorLoss",
    "neddf.loss.MaskBCELoss": "neddf_tpu.training.MaskBCELoss",
    "neddf.loss.MaskMSELoss": "neddf_tpu.training.MaskMSELoss",
    "neddf.loss.FieldsConstraintLoss": "neddf_tpu.training.FieldsConstraintLoss",
}

ConfigDict = Dict[str, Any]


def _load_yaml(path: Path) -> Any:
    with open(path) as f:
        return yaml.safe_load(f)


def _parse_value(text: str) -> Any:
    """Parse an override value with YAML semantics ('true', '1.5', '[1,2]')."""
    return yaml.safe_load(text)


def _set_dotted(cfg: ConfigDict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


def _get_dotted(cfg: ConfigDict, dotted: str) -> Any:
    node: Any = cfg
    for k in dotted.split("."):
        node = node[k]
    return node


def compose(
    config_dir: Union[str, Path],
    config_name: str = "config",
    overrides: Optional[List[str]] = None,
) -> ConfigDict:
    """Compose a config like `hydra.compose`.

    The root file's ``defaults`` list entries ``- group: name`` pull in
    ``config_dir/group/name.yaml`` under ``cfg[group]``. Overrides of the
    form ``group=name`` swap the group file; ``a.b.c=value`` set a leaf.
    A root file that has no ``defaults`` key is treated as an already
    composed config (this is what ``.hydra/config.yaml`` snapshots are).
    """
    config_dir = Path(config_dir)
    overrides = list(overrides or [])
    root = _load_yaml(config_dir / f"{config_name}.yaml") or {}

    cfg: ConfigDict = {}
    if "defaults" in root:
        group_choice: Dict[str, str] = {}
        for entry in root.pop("defaults"):
            if isinstance(entry, dict):
                for group, name in entry.items():
                    group_choice[str(group)] = str(name)
            elif entry != "_self_":
                raise ValueError(f"unsupported defaults entry: {entry!r}")
        # group swaps first (e.g. `dataset=test`)
        for ov in overrides:
            key, _, val = ov.partition("=")
            if "." not in key and key in group_choice:
                group_choice[key] = val
        for group, name in group_choice.items():
            cfg[group] = _load_yaml(config_dir / group / f"{name}.yaml")
        cfg.update(root)
    else:
        cfg = root

    # leaf overrides
    for ov in overrides:
        key, _, val = ov.partition("=")
        if "." in key or key not in cfg or not isinstance(cfg.get(key), dict):
            _set_dotted(cfg, key, _parse_value(val))
    return cfg


def resolve_target(target: str) -> Any:
    """Import the object named by a dotted ``_target_`` path."""
    target = _TARGET_ALIASES.get(target, target)
    module_name, _, attr = target.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def instantiate(node: ConfigDict, **extra: Any) -> Any:
    """Instantiate a ``_target_`` node (non-recursive, like the reference's
    ``_recursive_=False`` usage at neddf/scripts/run.py:17-21)."""
    if "_target_" not in node:
        raise ValueError(f"node has no _target_: {list(node)}")
    kwargs = {k: v for k, v in node.items() if not k.startswith("_")}
    kwargs.update(extra)
    cls = resolve_target(node["_target_"])
    return cls(**kwargs)


def save_snapshot(
    cfg: ConfigDict, overrides: List[str], run_dir: Union[str, Path]
) -> None:
    """Write ``.hydra/{config,overrides}.yaml`` into the run directory."""
    hydra_dir = Path(run_dir) / ".hydra"
    hydra_dir.mkdir(parents=True, exist_ok=True)
    with open(hydra_dir / "config.yaml", "w") as f:
        yaml.safe_dump(copy.deepcopy(cfg), f, sort_keys=False)
    with open(hydra_dir / "overrides.yaml", "w") as f:
        yaml.safe_dump(list(overrides), f)


def load_snapshot(run_dir: Union[str, Path]) -> ConfigDict:
    """Recompose the config saved in ``run_dir/.hydra`` (works for run dirs
    produced by this framework *and* by the PyTorch reference)."""
    return compose(Path(run_dir) / ".hydra", "config")
