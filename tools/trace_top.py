"""Summarise a jax.profiler Chrome trace: device time by XLA op.

Usage:
    python tools/trace_top.py <run_dir_or_trace.json.gz> [top_n]

Finds the newest ``*.trace.json.gz`` under the given directory (the
``log/profile`` tree written by StepProfiler / jax.profiler), walks the
"XLA Ops" threads (the per-op device timeline on TPU), and prints total
duration and call count per op name, descending — the ground truth for
where a step's device time goes (CLAUDE.md: wall-clock timing of
independent dispatches on the tunneled backend overlaps; only the trace
shows per-op execution).

Op names are grouped by a normalised prefix (fusion numbers and layer
indices stripped) so 8 per-layer instances of the same matmul read as
one line; pass top_n<0 to print raw ungrouped names.
"""
from __future__ import annotations

import gzip
import json
import pathlib
import re
import sys
from collections import defaultdict


def find_trace(path: pathlib.Path) -> pathlib.Path:
    if path.is_file():
        return path
    traces = sorted(
        path.rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime
    )
    if not traces:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return traces[-1]


def load_events(trace_path: pathlib.Path):
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # map (pid, tid) -> thread name; XLA op timelines are named
    # "XLA Ops" (TPU) / "Steps"/"XLA Modules" hold aggregates we skip
    tnames = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tnames[(ev.get("pid"), ev.get("tid"))] = ev["args"]["name"]
    rows = []
    for ev in events:
        if ev.get("ph") != "X":
            continue
        tname = tnames.get((ev.get("pid"), ev.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        rows.append((ev["name"], float(ev.get("dur", 0.0))))
    if not rows:  # CPU backends name threads differently; fall back
        for ev in events:
            if ev.get("ph") == "X" and ev.get("dur"):
                rows.append((ev["name"], float(ev["dur"])))
    return rows


_NORM = re.compile(r"\d+")


def main() -> None:
    path = pathlib.Path(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    raw = top_n < 0
    top_n = abs(top_n)
    trace = find_trace(path)
    rows = load_events(trace)
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for name, d in rows:
        key = name if raw else _NORM.sub("#", name)
        dur[key] += d
        cnt[key] += 1
    total = sum(dur.values())
    print(f"# {trace}")
    print(f"# total device-op time: {total / 1e3:.3f} ms "
          f"({len(rows)} events)")
    for key in sorted(dur, key=dur.get, reverse=True)[:top_n]:
        print(f"{dur[key] / 1e3:10.3f} ms  {cnt[key]:6d}x  {key}")


if __name__ == "__main__":
    main()
