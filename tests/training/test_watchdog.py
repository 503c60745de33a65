"""Stall watchdog: kill-on-stale + auto-resume (training/watchdog.py).

Simulates the known TPU-tunnel hang (observed at epoch 748/2000:
process alive, no writes) with a child that checkpoints, heartbeats,
then freezes on its first incarnation and completes when resumed — the
supervisor must detect staleness, kill by pid, relaunch with resume,
and return the clean exit. Also covers the fresh-restart path (no
checkpoint yet => resuming would crash-loop) and the restart bound.
"""
import sys
import textwrap
import time

import pytest

from neddf_tpu.training.watchdog import (
    has_checkpoint,
    newest_write_mtime,
    supervise,
)

CHILD = textwrap.dedent(
    """
    import sys, time
    from pathlib import Path

    run_dir = Path(sys.argv[1])
    resumed = len(sys.argv) > 2 and sys.argv[2] == "--resume"
    (run_dir / "log").mkdir(parents=True, exist_ok=True)
    (run_dir / "models").mkdir(exist_ok=True)
    marker = run_dir / "incarnations.txt"
    with open(marker, "a") as f:
        f.write(("resume" if resumed else "fresh") + "\\n")
    # a checkpoint lands early (epoch_save_model), like the real run
    (run_dir / "models" / "model_00100.ckpt").write_text("ckpt")
    for i in range(3):
        (run_dir / "log" / "events.out").write_text(str(i))
        time.sleep(0.05)
    if not resumed:
        time.sleep(3600)  # simulated lost-tunnel hang: alive, no writes
    (run_dir / "done.txt").write_text("done")
    """
)


def _child_cmd(tmp_path, run_dir):
    script = tmp_path / "child.py"
    script.write_text(CHILD)

    def build_cmd(resume):
        cmd = [sys.executable, str(script), str(run_dir)]
        if resume:
            cmd.append("--resume")
        return cmd

    return build_cmd


def test_watchdog_kills_stale_child_and_resumes(tmp_path):
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    t0 = time.time()
    rc = supervise(
        _child_cmd(tmp_path, run_dir),
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
    # checkpoint existed when the stall hit -> relaunch used --resume
    assert incarnations == ["fresh", "resume"]
    assert (run_dir / "done.txt").read_text() == "done"


def test_watchdog_restarts_fresh_before_first_checkpoint(tmp_path):
    """A crash before any checkpoint must NOT relaunch with --resume
    (that would crash-loop on FileNotFoundError)."""
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    script = tmp_path / "child.py"
    script.write_text(
        textwrap.dedent(
            """
            import sys
            from pathlib import Path

            run_dir = Path(sys.argv[1])
            resumed = len(sys.argv) > 2 and sys.argv[2] == "--resume"
            with open(run_dir / "incarnations.txt", "a") as f:
                f.write(("resume" if resumed else "fresh") + "\\n")
            n = len(open(run_dir / "incarnations.txt").read().split())
            raise SystemExit(0 if n >= 2 else 7)  # crash once, no ckpt
            """
        )
    )

    def build_cmd(resume):
        cmd = [sys.executable, str(script), str(run_dir)]
        if resume:
            cmd.append("--resume")
        return cmd

    rc = supervise(
        build_cmd, run_dir,
        stale_seconds=30.0, poll_seconds=0.3, max_restarts=3,
        grace_seconds=0.0,
    )
    assert rc == 0
    assert (run_dir / "incarnations.txt").read_text().split() == [
        "fresh", "fresh",
    ]


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


def test_has_checkpoint(tmp_path):
    assert not has_checkpoint(tmp_path)
    (tmp_path / "models").mkdir()
    assert not has_checkpoint(tmp_path)
    (tmp_path / "models" / "model_00100.ckpt").write_text("x")
    assert has_checkpoint(tmp_path)
    (tmp_path / "models" / "model_00100.ckpt").unlink()
    (tmp_path / "models" / "100").mkdir()  # orbax step dir
    assert has_checkpoint(tmp_path)


def test_watchdog_probe_gates_relaunch(tmp_path):
    """With probe_cmd set, a relaunch after a stall must wait for the
    probe to succeed (simulating the dead-tunnel failure mode where the
    backend is unreachable): the probe fails until a flag file exists,
    which the second probe attempt's backoff window lets us create."""
    run_dir = tmp_path / "run"
    build_cmd = _child_cmd(tmp_path, run_dir)
    flag = tmp_path / "backend_up.txt"
    probe_script = tmp_path / "probe.py"
    probe_script.write_text(
        textwrap.dedent(
            f"""
            import sys
            from pathlib import Path
            flag = Path({str(flag)!r})
            if not flag.exists():
                flag.write_text("up")  # next probe attempt succeeds
                sys.exit(1)
            sys.exit(0)
            """
        )
    )
    t0 = time.time()
    rc = supervise(
        build_cmd,
        run_dir,
        stale_seconds=2.0,
        poll_seconds=0.1,
        # generous: interpreter startup itself can take seconds when
        # the site hook probes a dead backend
        startup_grace_seconds=60.0,
        grace_seconds=0.0,
        probe_cmd=[sys.executable, str(probe_script)],
        probe_timeout=10.0,
        probe_backoff=0.5,
        max_probe_waits=5,
    )
    assert rc == 0
    assert (run_dir / "done.txt").exists()
    incarnations = (run_dir / "incarnations.txt").read_text().split()
    assert incarnations == ["fresh", "resume"]
    # the failed first probe forced at least one backoff sleep
    assert time.time() - t0 >= 0.5
    assert flag.exists()


def test_watchdog_gives_up_when_backend_stays_down(tmp_path):
    """All probes failing must raise instead of looping forever."""
    run_dir = tmp_path / "run"
    build_cmd = _child_cmd(tmp_path, run_dir)
    with pytest.raises(RuntimeError, match="backend unreachable"):
        supervise(
            build_cmd,
            run_dir,
            stale_seconds=2.0,
            poll_seconds=0.1,
            startup_grace_seconds=60.0,
            grace_seconds=0.0,
            probe_cmd=[sys.executable, "-c", "raise SystemExit(1)"],
            probe_timeout=10.0,
            probe_backoff=0.05,
            max_probe_waits=3,
        )
