"""Decompose the flagship render wall on the axon TPU.

Answers the round-3 question "where do ~0.25 s of the 0.46 s headline render
go?" by timing, per render call and per launch chunk:

  - prep      (drain/compile-check/param-encode/feed staging, host)
  - dispatch  (render_fn launches -- includes the per-call link round trip)
  - copy_start(copy_to_host_async enqueues)
  - transfer  (device_get materialization; per-chunk)
  - notify    (source ended-event device_get)

and sweeping GA_RENDER_CHUNK (launch-chunk size) for both wire formats, plus
a raw device->host link probe (single stream vs K parallel slices) that gives
the physical floor for this output size.

Usage:  python -m benchmarks.wall_probe [--superblock 64] [--sweep-sb]
Writes benchmarks/results/wall_probe.json. One process; the first program
execution absorbs the remote compile service's cold start (~1-10 min).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "results")
SECONDS = float(os.environ.get("GA_PROBE_SECONDS", "30"))


def build(superblock):
    from benchmarks.configs import CONFIGS

    _, builder = CONFIGS[4]
    ctx = builder(superblock=superblock)
    fps = superblock * 128
    frames = int(SECONDS * ctx.sample_rate) // fps * fps
    return ctx, frames


def timed_renders(ctx, frames, pack, runs=3):
    """Best-of-N renders; returns (best_wall, breakdown_of_best_run)."""
    best, bd = np.inf, None
    for _ in range(runs):
        t0 = time.perf_counter()
        if pack == "int16":
            ctx.render_pcm16(frames)
        else:
            ctx.render(frames)
        w = time.perf_counter() - t0
        if w < best:
            best, bd = w, dict(ctx.stats.last_breakdown)
    return best, bd


def chunk_sweep(ctx, frames, chunks, runs=3, packs=("int16", None)):
    out = {}
    for pack in packs:
        for chunk in chunks:
            os.environ["GA_RENDER_CHUNK"] = str(chunk)
            # warm any new scan-length programs (remainder chunks)
            timed_renders(ctx, frames, pack, runs=1)
            wall, bd = timed_renders(ctx, frames, pack, runs=runs)
            key = f"{'pcm16' if pack else 'f32'}_chunk{str(chunk).replace(',', '+')}"
            out[key] = {
                "wall_s": round(wall, 4),
                "xrt": round(frames / ctx.sample_rate / wall, 1),
                **{
                    k: (round(v, 4) if isinstance(v, float)
                        else [round(x, 4) for x in v] if isinstance(v, list)
                        else v)
                    for k, v in (bd or {}).items()
                },
            }
            print(json.dumps({key: out[key]}), flush=True)
    return out


def link_probe(n_int16):
    """Raw device->host floor for the headline output size."""
    import jax
    import jax.numpy as jnp

    src = jax.device_put(np.zeros(n_int16, np.int16))
    bump = jax.jit(lambda a: a ^ jnp.int16(1))

    def single():
        z = bump(src)
        t0 = time.perf_counter()
        np.asarray(z)
        return time.perf_counter() - t0

    results = {"bytes": n_int16 * 2}
    np.asarray(bump(src))  # compile
    results["single_stream_s"] = round(min(single() for _ in range(3)), 4)

    for k in (2, 4, 8):
        split = jax.jit(
            lambda a, k=k: tuple(
                a[i * (n_int16 // k):(i + 1) * (n_int16 // k)] for i in range(k)
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
    ap.add_argument("--superblock", type=int, default=64)
    ap.add_argument("--sweep-sb", action="store_true",
                    help="also probe a superblock-32 context")
    ap.add_argument("--chunks", type=str, default="175,64,35,16")
    ap.add_argument("--schedules", type=str, default="",
                    help="';'-separated GA_RENDER_CHUNK schedules to sweep "
                         "(e.g. '5,34;9,34') — head-chunk experiments; "
                         "pcm16 only")
    ap.add_argument("--out", type=str, default="wall_probe.json",
                    help="artifact filename under benchmarks/results/")
    args = ap.parse_args()

    chunks = [int(c) for c in args.chunks.split(",")]
    report = {"superblock": args.superblock, "seconds": SECONDS}

    t0 = time.perf_counter()
    ctx, frames = build(args.superblock)
    ctx.render_pcm16(frames)  # cold compile (renderer + pack program)
    report["cold_compile_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps({"cold_compile_s": report["cold_compile_s"]}), flush=True)

    report["sweep"] = chunk_sweep(ctx, frames, chunks)
    if args.schedules:
        report["schedule_sweep"] = chunk_sweep(
            ctx, frames, args.schedules.split(";"), packs=("int16",)
        )
    report["link"] = link_probe(frames * 2)
    print(json.dumps({"link": report["link"]}), flush=True)

    if args.sweep_sb:
        # Reset the schedule env a prior --schedules sweep left behind, so
        # this warm render doesn't cold-compile scan lengths the sb32 chunk
        # sweep never uses (each distinct chunk size is a compiled program).
        os.environ["GA_RENDER_CHUNK"] = str((chunks[0] if chunks else 32) * 2)
        ctx32, frames32 = build(32)
        ctx32.render_pcm16(frames32)
        report["sweep_sb32"] = chunk_sweep(
            ctx32, frames32, [c * 2 for c in chunks if c * 2 <= 352]
        )

    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, args.out), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
