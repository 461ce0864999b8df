"""Chunk-schedule sweep for the IMA-ADPCM wire path on the axon TPU.

The round-4 launch-schedule probe (results/wall_probe_sched.json) found
chunk-35 optimal for int16 PCM (5.7 MB on the wire). ADPCM delivery cut
bytes ~3.9x (1.45 MB), which shifts the trade-off between per-chunk
dispatch round trips and parallel device->host stream concurrency — this
probe re-asks the question at the new wire size:

  - GA_RENDER_CHUNK in {175, 35, 25, 7, 5} (divisors of 175 steps, so each
    schedule is a single compiled scan length)
  - raw link floor for 1.45 MB: single stream vs K parallel slices

Usage:  python -m benchmarks.probe adpcm-chunk-sched [--runs 5]
Writes benchmarks/results/adpcm_chunk_sched.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "results")
SECONDS = float(os.environ.get("GA_PROBE_SECONDS", "30"))


def build(superblock=64):
    from benchmarks.configs import CONFIGS

    _, builder = CONFIGS[4]
    ctx = builder(superblock=superblock)
    fps = superblock * 128
    frames = int(SECONDS * ctx.sample_rate) // fps * fps
    return ctx, frames


def timed_adpcm(ctx, frames, runs, gap_s=1.0):
    best, bd = np.inf, None
    walls = []
    for i in range(runs):
        if i:
            time.sleep(gap_s)
        t0 = time.perf_counter()
        ctx.render_adpcm(frames)
        w = time.perf_counter() - t0
        walls.append(round(w, 4))
        if w < best:
            best, bd = w, dict(ctx.stats.last_breakdown)
    return best, walls, bd


def link_probe(nbytes):
    """Raw device->host floor for the ADPCM output size (uint8 rows)."""
    import jax
    import jax.numpy as jnp

    src = jax.device_put(np.zeros(nbytes, np.uint8))
    bump = jax.jit(lambda a: a ^ jnp.uint8(1))
    np.asarray(bump(src))  # compile

    def single():
        z = bump(src)
        t0 = time.perf_counter()
        np.asarray(z)
        return time.perf_counter() - t0

    results = {"bytes": nbytes}
    results["single_stream_s"] = round(min(single() for _ in range(3)), 4)
    for k in (2, 4, 8, 16):
        split = jax.jit(
            lambda a, k=k: tuple(
                a[i * (nbytes // k):(i + 1) * (nbytes // k)] for i in range(k)
            )
        )
        np.asarray(split(src)[0])  # compile

        def multi():
            zs = split(bump(src))
            t0 = time.perf_counter()
            for z in zs:
                z.copy_to_host_async()
            for z in zs:
                np.asarray(z)
            return time.perf_counter() - t0

        results[f"parallel_{k}_streams_s"] = round(
            min(multi() for _ in range(3)), 4
        )
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--chunks", type=str, default="175,35,25,7,5")
    ap.add_argument("--out", type=str, default="adpcm_chunk_sched.json")
    args = ap.parse_args()

    report = {"seconds": SECONDS}
    t0 = time.perf_counter()
    ctx, frames = build()
    os.environ["GA_RENDER_CHUNK"] = "35"
    ctx.render_adpcm(frames)  # cold compile
    report["cold_compile_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps({"cold_compile_s": report["cold_compile_s"]}), flush=True)

    sweep = {}
    for chunk in args.chunks.split(","):
        os.environ["GA_RENDER_CHUNK"] = chunk
        timed_adpcm(ctx, frames, runs=1)  # warm any new scan length
        wall, walls, bd = timed_adpcm(ctx, frames, runs=args.runs)
        key = f"adpcm_chunk{chunk.replace(',', '+')}"
        sweep[key] = {
            "wall_s": round(wall, 4),
            "xrt": round(frames / ctx.sample_rate / wall, 1),
            "walls": walls,
            **{
                k: (round(v, 4) if isinstance(v, float)
                    else [round(x, 4) for x in v] if isinstance(v, list)
                    else v)
                for k, v in (bd or {}).items()
            },
        }
        print(json.dumps({key: sweep[key]}), flush=True)
    report["sweep"] = sweep

    report["link"] = link_probe(1_453_568)
    print(json.dumps({"link": report["link"]}), flush=True)

    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, args.out), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
