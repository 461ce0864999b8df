"""Chunk-schedule sweep for LONG (steady-state) ADPCM renders.

The headline bench measures steady-state delivery over a ~4-minute render
(8x the 30 s flagship). Its wall breakdown at chunk-35 shows ~0.27 s of
transfer (link-floored) plus ~0.07 s of host DISPATCH spread over 40 chunk
launches (~1.8 ms each) — on the tunneled device, launch RPCs share the
link with the streaming PCM pull, so dispatch is not free even while
transfers overlap compute. chunk-35 was tuned for the 30 s render
(adpcm_chunk_sched.json), where 5 chunks keep dispatch negligible; at 40
chunks it is ~20% of the wall.

This probe re-asks the schedule question at the steady length: bigger
chunks amortize dispatch (fewer launches), and at steady state the
first-byte latency argument for small chunks is irrelevant because total
compute (~0.03 s at ~1100x) is tiny against the ~0.27 s transfer floor.

  - GA_RENDER_CHUNK in {35, 70, 140, 280} (divisors of the 1400-step
    steady render, so each schedule is ONE compiled scan length)

Usage:  python -m benchmarks.probe steady-chunk-sched [--runs 8]
Writes benchmarks/results/steady_chunk_sched.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "results")
SECONDS = float(os.environ.get("GA_PROBE_SECONDS", "30"))
STEADY_MULT = int(os.environ.get("GA_PROBE_STEADY_MULT", "8"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--gap-s", type=float, default=4.0)
    ap.add_argument(
        "--scheds", default="35,70,140,280",
        help="comma-separated list of GA_RENDER_CHUNK values to sweep",
    )
    args = ap.parse_args()

    from benchmarks.configs import CONFIGS

    _, builder = CONFIGS[4]
    superblock = 64
    ctx = builder(superblock=superblock)
    fps = superblock * 128
    frames = int(SECONDS * ctx.sample_rate) // fps * fps
    frames_steady = frames * STEADY_MULT
    n_steps = frames_steady // fps
    rendered_s = frames_steady / ctx.sample_rate

    out = {
        "steady_seconds": rendered_s,
        "n_steps": n_steps,
        "superblock": superblock,
        "runs": args.runs,
        "gap_s": args.gap_s,
        "schedules": {},
    }
    for sched in args.scheds.split(","):
        sched = sched.strip()
        assert n_steps % int(sched) == 0, (sched, n_steps)
        ctx.chunk_schedule = sched
        t_c = time.perf_counter()
        ctx.render_adpcm(frames_steady)  # compile/warm this scan length
        warm_s = time.perf_counter() - t_c
        walls, best, bd = [], np.inf, None
        for i in range(args.runs):
            if i:
                time.sleep(args.gap_s)
            t0 = time.perf_counter()
            ctx.render_adpcm(frames_steady)
            w = time.perf_counter() - t0
            walls.append(round(w, 4))
            if w < best:
                best, bd = w, dict(ctx.stats.last_breakdown)
        from benchmarks.artifacts import clean_breakdown

        bd = clean_breakdown(bd)
        out["schedules"][sched] = {
            "best_wall_s": round(best, 4),
            "xrt": round(rendered_s / best, 1),
            "walls": walls,
            "warm_s": round(warm_s, 1),
            "breakdown": bd,
        }
        print(sched, out["schedules"][sched], flush=True)

    path = os.path.join(RESULTS, "steady_chunk_sched.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
