"""Run BASELINE benchmark configs: python -m benchmarks.run [--config N] [--seconds S].

Prints one JSON line per config: xRT, p50 quantum time, compile time.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from benchmarks.configs import CONFIGS


def run_config(n: int, seconds: float = 30.0) -> dict:
    name, builder = CONFIGS[n]
    t0 = time.perf_counter()
    ctx = builder()
    frames_per_step = ctx.superblock * 128
    frames = int(seconds * ctx.sample_rate) // frames_per_step * frames_per_step
    ctx.render(frames)  # compile + warm
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = ctx.render(frames)
    wall = time.perf_counter() - t0
    rendered = out.shape[1] / ctx.sample_rate
    return {
        "config": n,
        "name": name,
        "xrt": round(rendered / wall, 2),
        "wall_seconds": round(wall, 4),
        "rendered_seconds": rendered,
        "mean_quantum_us": round(wall / (out.shape[1] // 128) * 1e6, 3),
        "compile_seconds": round(compile_s, 1),
        "output_rms": float(np.sqrt(np.mean(out.astype(np.float64) ** 2))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0, help="config 1-5; 0 = all")
    ap.add_argument("--seconds", type=float, default=30.0)
    args = ap.parse_args()
    targets = [args.config] if args.config else sorted(CONFIGS)
    for n in targets:
        print(json.dumps(run_config(n, args.seconds)), flush=True)


if __name__ == "__main__":
    main()
