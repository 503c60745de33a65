"""Stall watchdog: kill-on-stale + auto-resume (training/watchdog.py).

Simulates the known TPU-tunnel hang with a child that writes heartbeats
then freezes on its first incarnation and completes on its second —
the supervisor must detect staleness, kill by pid, relaunch with
resume, and return the clean exit.
"""
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import pytest

from neddf_tpu.training.watchdog import newest_write_mtime, supervise

CHILD = textwrap.dedent(
    """
    import sys, time
    from pathlib import Path

    run_dir = Path(sys.argv[1])
    resumed = len(sys.argv) > 2 and sys.argv[2] == "--resume"
    (run_dir / "log").mkdir(parents=True, exist_ok=True)
    marker = run_dir / "incarnations.txt"
    with open(marker, "a") as f:
        f.write(("resume" if resumed else "fresh") + "\\n")
    for i in range(3):
        (run_dir / "log" / "events.out").write_text(str(i))
        time.sleep(0.05)
    if not resumed:
        time.sleep(3600)  # simulated lost-tunnel hang: alive, no writes
    (run_dir / "models").mkdir(exist_ok=True)
    (run_dir / "models" / "model_00001.ckpt").write_text("done")
    """
)


def test_watchdog_kills_stale_child_and_resumes(tmp_path):
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    script = tmp_path / "child.py"
    script.write_text(CHILD)

    def build_cmd(resume):
        cmd = [sys.executable, str(script), str(run_dir)]
        if resume:
            cmd.append("--resume")
        return cmd

    t0 = time.time()
    rc = supervise(
        build_cmd,
        run_dir,
        # the venv interpreter takes seconds to start (sitecustomize
        # imports jax), so the window must exceed startup time
        stale_seconds=15.0,
        poll_seconds=0.5,
        max_restarts=2,
        grace_seconds=0.1,
    )
    assert rc == 0
    # the hang was detected well before the child's 3600s sleep
    assert time.time() - t0 < 120
    incarnations = (run_dir / "incarnations.txt").read_text().split()
    assert incarnations == ["fresh", "resume"]
    assert (run_dir / "models" / "model_00001.ckpt").read_text() == "done"


def test_watchdog_gives_up_after_max_restarts(tmp_path):
    run_dir = tmp_path / "run"
    run_dir.mkdir()

    def build_cmd(resume):
        return [sys.executable, "-c", "raise SystemExit(3)"]

    with pytest.raises(RuntimeError, match="giving up"):
        supervise(
            build_cmd, run_dir,
            stale_seconds=5.0, poll_seconds=0.2, max_restarts=2,
            grace_seconds=0.0,
        )


def test_watchdog_passes_through_clean_exit(tmp_path):
    run_dir = tmp_path / "run"
    run_dir.mkdir()

    def build_cmd(resume):
        assert not resume
        return [sys.executable, "-c", "pass"]

    assert supervise(build_cmd, run_dir, stale_seconds=5.0,
                     poll_seconds=0.2) == 0


def test_newest_write_mtime_scans_log_and_models(tmp_path):
    assert newest_write_mtime(tmp_path / "nope") == 0.0
    (tmp_path / "log").mkdir()
    f = tmp_path / "log" / "events.out"
    f.write_text("x")
    assert newest_write_mtime(tmp_path) == pytest.approx(
        f.stat().st_mtime, abs=1e-3
    )
