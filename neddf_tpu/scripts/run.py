"""Training entry point (twin of neddf/scripts/run.py).

Usage:
    python -m neddf_tpu.scripts.run [group=name ...] [a.b.c=value ...]
    python -m neddf_tpu.scripts.run --resume <run_dir>
    python -m neddf_tpu.scripts.run --watchdog [secs] [overrides ...]

Composes config/config.yaml with Hydra-style overrides, creates a run
directory outputs/{date}/{time}, snapshots .hydra/ for later eval
recomposition, and trains. Seed 3408 honored like the reference.

``--resume`` recomposes the snapshot saved in <run_dir>/.hydra, loads
the newest models/model_*.ckpt (full state: params + optimizer +
iteration + camera deltas — a capability the reference lacks, its .pth
holds weights only) and continues training in the same directory.

``--watchdog [secs]`` (default 600) supervises training in a child
process and auto-recovers the known TPU-tunnel stall: if the run dir
sees no writes for ``secs`` while the child lives, the child is killed
by pid and training resumes from the newest checkpoint
(training/watchdog.py). Composable with --resume.
"""
from __future__ import annotations

import datetime
import os
import sys
from pathlib import Path


def _resume(run_dir: Path) -> None:
    from neddf_tpu import config as config_lib

    run_dir = run_dir.resolve()
    cfg = config_lib.load_snapshot(run_dir)
    os.chdir(run_dir)
    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    models = run_dir / "models"
    ckpts = sorted(models.glob("model_*.ckpt"))
    has_orbax_steps = models.is_dir() and any(
        p.name.isdigit() for p in models.iterdir()
    )
    if ckpts:
        latest = ckpts[-1]
    elif has_orbax_steps:
        # async/orbax layout: step directories instead of .ckpt files;
        # load_checkpoint resolves the latest step itself
        latest = models / "model_latest.ckpt"
    else:
        raise FileNotFoundError(
            f"no model_*.ckpt files or orbax step dirs under {models}"
        )
    trainer.load_checkpoint(latest)
    print(f"resumed from {latest} at iteration {trainer.iteration}")
    trainer.run_train()


def _supervised(argv, stale_seconds: float) -> None:
    """--watchdog: run training as a monitored child with auto-resume."""
    import datetime as _dt

    from neddf_tpu.training.watchdog import supervise

    repo_root = Path(__file__).resolve().parents[2]
    if argv and argv[0] == "--resume":
        run_dir = Path(argv[1]).resolve()
        first_cmd = [sys.executable, "-m", "neddf_tpu.scripts.run",
                     "--resume", str(run_dir)]
    else:
        # pin the run dir so every incarnation shares it
        run_dir = None
        rest = []
        for ov in argv:
            if ov.startswith("hydra.run.dir="):
                run_dir = Path(ov.split("=", 1)[1]).resolve()
            else:
                rest.append(ov)
        if run_dir is None:
            now = _dt.datetime.now()
            run_dir = (repo_root / "outputs" / now.strftime("%Y-%m-%d")
                       / now.strftime("%H-%M-%S"))
        first_cmd = [sys.executable, "-m", "neddf_tpu.scripts.run",
                     f"hydra.run.dir={run_dir}", *rest]

    def build_cmd(resume: bool):
        if resume:
            return [sys.executable, "-m", "neddf_tpu.scripts.run",
                    "--resume", str(run_dir)]
        return first_cmd

    # backend-health probe before every relaunch: a tiny subprocess
    # that initialises the backend and exits. While it fails (e.g. the
    # TPU tunnel is down — observed live: the relay process dies when
    # the orchestrator transport drops and every client then blocks
    # forever in backend init), the supervisor backs off instead of
    # burning startup-grace windows on doomed resume incarnations.
    probe_cmd = [sys.executable, "-c", "import jax; jax.devices()"]
    raise SystemExit(
        supervise(build_cmd, run_dir, stale_seconds, probe_cmd=probe_cmd)
    )


def main(argv: "list | None" = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)

    if argv and argv[0] == "--watchdog":
        argv = argv[1:]
        stale = 600.0
        if argv and argv[0].replace(".", "", 1).isdigit():
            stale = float(argv[0])
            argv = argv[1:]
        _supervised(argv, stale)
        return

    if argv and argv[0] == "--resume":
        _resume(Path(argv[1]))
        return

    repo_root = Path(__file__).resolve().parents[2]
    from neddf_tpu import config as config_lib

    # hydra.run.dir=<path> is a Hydra built-in the reference inherits —
    # honor it; it is a runtime location, not part of the config snapshot
    run_dir_override = None
    overrides = []
    for ov in argv:
        if ov.startswith("hydra.run.dir="):
            run_dir_override = Path(ov.split("=", 1)[1])
        else:
            overrides.append(ov)

    cfg = config_lib.compose(repo_root / "config", overrides=overrides)

    # re-root relative dataset dir against the repo root (run.py:15-16);
    # fall back to the reference's bundled data when ours is absent
    ds_dir = Path(cfg["dataset"]["dataset_dir"])
    if not ds_dir.is_absolute():
        candidate = repo_root / ds_dir
        if not candidate.exists() and Path("/root/reference", ds_dir).exists():
            candidate = Path("/root/reference", ds_dir)
        cfg["dataset"]["dataset_dir"] = str(candidate)

    # hydra-style run dir outputs/{date}/{time} unless overridden
    if run_dir_override is not None:
        run_dir = run_dir_override.resolve()
    else:
        now = datetime.datetime.now()
        run_dir = (
            repo_root / "outputs" / now.strftime("%Y-%m-%d") / now.strftime("%H-%M-%S")
        )
    run_dir.mkdir(parents=True, exist_ok=True)
    config_lib.save_snapshot(cfg, overrides, run_dir)
    os.chdir(run_dir)
    print(f"run dir: {run_dir}")

    trainer = config_lib.instantiate(cfg["trainer"], global_config=cfg)
    trainer.run_train()


if __name__ == "__main__":
    main()
