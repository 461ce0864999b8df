"""Steady-render LENGTH sweep for ADPCM delivery throughput.

Each render call pays a fixed ~27 ms link round trip + ~8 ms host dispatch
(link_semantics.json) regardless of duration. The headline's steady phase
(8x the 30 s flagship = ~4 min) still carries that fixed cost at ~10% of
its ~0.32 s wall, so the reported xRT understates the renderer's true
steady-state rate (asymptote = rendered_seconds / marginal wall, ~838x at
the 2026-08-19 compute/link ratio). This probe asks how much a LONGER
steady render recovers, and whether the chunk schedule's optimum moves
with length (more chunks -> more dispatch RPCs contending with the pull).

  - GA length mult in {8, 16, 32} (x 30 s = 4 / 8 / 16 minutes)
  - GA_RENDER_CHUNK in {140, 280} (divisors of every swept step count)

Usage:  python -m benchmarks.probe steady-len [--runs 5]
Writes benchmarks/results/steady_len.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "results")
SECONDS = float(os.environ.get("GA_PROBE_SECONDS", "30"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--gap-s", type=float, default=3.0)
    ap.add_argument("--mults", default="8,16,32")
    ap.add_argument("--scheds", default="140,280")
    args = ap.parse_args()

    from benchmarks.configs import CONFIGS

    _, builder = CONFIGS[4]
    superblock = 64
    ctx = builder(superblock=superblock)
    fps = superblock * 128
    frames = int(SECONDS * ctx.sample_rate) // fps * fps

    out = {
        "superblock": superblock,
        "runs": args.runs,
        "gap_s": args.gap_s,
        "cases": {},
    }
    for mult in (int(m) for m in args.mults.split(",")):
        frames_steady = frames * mult
        n_steps = frames_steady // fps
        rendered_s = frames_steady / ctx.sample_rate
        for sched in args.scheds.split(","):
            sched = sched.strip()
            assert n_steps % int(sched) == 0, (sched, n_steps)
            ctx.chunk_schedule = sched
            t_c = time.perf_counter()
            ctx.render_adpcm(frames_steady)  # compile/warm this geometry
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
            case = {
                "rendered_s": rendered_s,
                "best_wall_s": round(best, 4),
                "xrt": round(rendered_s / best, 1),
                "walls": walls,
                "warm_s": round(warm_s, 1),
                "breakdown": bd,
            }
            out["cases"][f"mult{mult}/chunk{sched}"] = case
            print(f"mult{mult}/chunk{sched}", case, flush=True)

    path = os.path.join(RESULTS, "steady_len.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
