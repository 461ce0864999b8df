"""Compile-latency profiler: where does a graph's COMPILE time go?

Usage: python -m benchmarks.compile_profile [config] [n_steps] [--prefixes]

For the full render (and optionally each stage prefix) reports:
  * trace+lower seconds (JAX tracing -> StableHLO),
  * XLA compile seconds,
  * StableHLO text size (program bloat proxy — the compile-time driver).

Round-2 finding: the flagship graph's cold compile regressed 6.9 s -> 314 s
with run-time kernels that build large HLO; this tool localizes which stage's
program is outsized before attacking it.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.configs import CONFIGS


def profile_prefix(cg, ctx, n_steps, stage_limit=None, first_exec=False):
    step, _ = cg.make_step_fn(stage_limit=stage_limit)
    states = ctx._states
    encs = ctx._encs
    consts = ctx._consts
    T = ctx.superblock * 128
    f0s = jnp.arange(n_steps, dtype=jnp.int64) * T
    inc = np.float64(128) / ctx.sample_rate
    bts = np.add.accumulate(
        np.full(n_steps * ctx.superblock, inc)
    ).reshape(n_steps, ctx.superblock)

    def render(s, e, c, f, bt):
        def body(carry, xs):
            f0, b = xs
            ns, out = step(carry, e, c, {}, f0, b)
            return ns, jnp.sum(out)

        s, outs = jax.lax.scan(body, s, (f, bt))
        return jnp.sum(outs)

    fn = jax.jit(render)
    t0 = time.perf_counter()
    lowered = fn.lower(states, encs, consts, f0s, bts)
    t_trace = time.perf_counter() - t0
    hlo_chars = len(lowered.as_text())
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    if first_exec:
        # On the axon backend the REAL chip-side compile happens lazily at
        # first execution; .compile() above only runs the local pipeline.
        t0 = time.perf_counter()
        np.asarray(fn(states, encs, consts, f0s, bts))
        t_compile = time.perf_counter() - t0
    return t_trace, t_compile, hlo_chars


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    prefixes = "--prefixes" in sys.argv
    first_exec = "--first-exec" in sys.argv
    name, builder = CONFIGS[n]
    print(
        f"config {n} ({name}), scan={n_steps}, backend={jax.devices()[0].platform}",
        flush=True,
    )
    ctx = builder()
    ctx._drain_commands()
    ctx._ensure_compiled()
    ctx._ensure_params_encoded()
    cg = ctx._compiled

    limits = list(range(1, len(cg.plan) + 1)) if prefixes else [None]
    prev_c = prev_h = 0.0
    for k in limits:
        tr, tc, hc = profile_prefix(cg, ctx, n_steps, k, first_exec)
        if k is None:
            print(
                f"FULL    trace {tr:7.1f}s  compile {tc:7.1f}s  "
                f"hlo {hc/1e6:8.2f} MB", flush=True,
            )
        else:
            sp = cg.plan[k - 1]
            label = f"{sp['kind']}:{type(sp['rep']).__name__} x{sp['n_lanes']}"
            print(
                f"1..{k:2d}  trace {tr:6.1f}s  compile {tc:7.1f}s "
                f"(+{tc - prev_c:7.1f})  hlo {hc/1e6:7.2f} MB "
                f"(+{(hc - prev_h)/1e6:6.2f})  {label}", flush=True,
            )
            prev_c, prev_h = tc, hc


if __name__ == "__main__":
    main()
