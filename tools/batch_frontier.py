"""Throughput frontier: flagship NeDDF train step vs batch size (v5e).

Round-4 verdict #3: the roofline analysis names batch scaling as the
one remaining single-chip lever (the fixed PE/sampler/bookkeeping glue
amortises; the Pallas kernels are near-roofline) but no rays/s number
existed off the reference shape B=512. This sweeps the frontier with
the SAME param-chained timing methodology as bench.py:

    B=512, 1024, 2048   monolithic
    B=4096              grad_accum=2 and 4 (the monolithic B=4096 grad
                        program is the known XLA-miscompile regime —
                        kernels/dual_mlp.py docstring; grad_accum is the
                        shipped mitigation and is exactly equivalent)

Usage:  python tools/batch_frontier.py [--iters 20]

Prints one JSON line per point and a table; results recorded in
BASELINE.md "Batch-size throughput frontier".

MEASURED OUTCOME (2026-08-20, v5e-1): the hypothesis was WRONG — the
frontier is flat-to-negative (B=512: 26.0k rays/s via bench.py's
methodology vs 23.1-24.8k at B=1024-4096). The glue is per-ray work,
so nothing amortises; B>=2048 additionally splits the trunk into
multiple <=393216-row kernel calls. Kept as the regression probe for
that finding.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--points", type=str, default="512,1024,2048,4096:2,4096:4",
                    help="comma list of B or B:grad_accum")
    args = ap.parse_args()

    if not bench._backend_reachable():
        print(json.dumps({"error": "backend unreachable"}))
        return

    rows = []
    for spec in args.points.split(","):
        if ":" in spec:
            b_s, ga_s = spec.split(":")
            b, ga = int(b_s), int(ga_s)
        else:
            b, ga = int(spec), 1
        step, params, opt_state, key = bench.build_flagship_step(b, ga)
        flops = bench.flagship_matmul_flops(params, b)
        dt, loss = bench.measure_step(
            step, params, opt_state, key, warmup=3, iters=args.iters
        )
        point = {
            "batch": b,
            "grad_accum": ga,
            "ms_per_step": round(dt * 1e3, 2),
            "rays_per_sec": round(b / dt, 1),
            "mfu": round(flops / dt / bench.V5E_BF16_PEAK_FLOPS, 4),
            "finite": bool(np.isfinite(loss)),
            "loss": round(float(loss), 5),
        }
        rows.append(point)
        print(json.dumps(point), flush=True)

    print(f"\n{'B':>6} {'ga':>3} {'ms/step':>9} {'rays/s':>9} {'MFU':>6}  ok")
    for p in rows:
        print(
            f"{p['batch']:>6} {p['grad_accum']:>3} {p['ms_per_step']:>9} "
            f"{p['rays_per_sec']:>9} {p['mfu']:>6}  "
            f"{'yes' if p['finite'] else 'NO — non-finite loss'}"
        )


if __name__ == "__main__":
    main()
