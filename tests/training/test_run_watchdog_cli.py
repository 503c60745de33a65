"""--watchdog CLI plumbing in scripts/run.py (supervisor integration)."""
import sys

import pytest

import neddf_tpu.scripts.run as run_mod


def test_watchdog_flag_builds_supervised_commands(monkeypatch, tmp_path):
    captured = {}

    def fake_supervise(build_cmd, run_dir, stale_seconds, **kw):
        captured["run_dir"] = run_dir
        captured["stale"] = stale_seconds
        captured["fresh"] = build_cmd(False)
        captured["resume"] = build_cmd(True)
        captured["probe"] = kw.get("probe_cmd")
        return 0

    monkeypatch.setattr(
        "neddf_tpu.training.watchdog.supervise", fake_supervise
    )
    with pytest.raises(SystemExit) as e:
        run_mod.main([
            "--watchdog", "120",
            f"hydra.run.dir={tmp_path}/run", "trainer=test",
        ])
    assert e.value.code == 0
    assert captured["stale"] == 120.0
    assert str(captured["run_dir"]).endswith("/run")
    fresh = captured["fresh"]
    assert fresh[0] == sys.executable
    assert "neddf_tpu.scripts.run" in fresh
    assert f"hydra.run.dir={tmp_path}/run" in fresh
    assert "trainer=test" in fresh
    assert "--watchdog" not in fresh  # child must not recurse
    resume = captured["resume"]
    assert resume[-2:] == ["--resume", str(captured["run_dir"])]
    # backend-health probe wired in: a tiny jax-devices subprocess
    probe = captured["probe"]
    assert probe[0] == sys.executable and "jax" in probe[-1]


def test_watchdog_default_window_and_resume_mode(monkeypatch, tmp_path):
    captured = {}

    def fake_supervise(build_cmd, run_dir, stale_seconds, **kw):
        captured["stale"] = stale_seconds
        captured["first"] = build_cmd(False)
        captured["probe"] = kw.get("probe_cmd")
        return 0

    monkeypatch.setattr(
        "neddf_tpu.training.watchdog.supervise", fake_supervise
    )
    run_dir = tmp_path / "old_run"
    run_dir.mkdir()
    with pytest.raises(SystemExit):
        run_mod.main(["--watchdog", "--resume", str(run_dir)])
    assert captured["stale"] == 600.0  # default window
    # --watchdog --resume supervises a resume child
    assert captured["first"][-2:] == ["--resume", str(run_dir)]
