"""Does a device->host copy overlap queued compute on the axon backend?

The adpcm-chunk-sched probe showed the flagship ADPCM wall sits at the
SERIALIZED floor: ~27 ms compute + ~25 ms first-byte latency + ~29 ms of
bytes, and the first chunk's device_get takes ~59 ms regardless of chunk
size — as if no bytes move until the whole launch queue drains. This probe
asks the runtime directly:

  1. get(pre)            — baseline: fetch a precomputed 1.45 MB array
  2. burn || get(pre)    — fetch the SAME array while ~27 ms of unrelated
                           compute is queued; if the copy engine is
                           independent this costs ~= (1), if the queue is
                           strictly in-order it costs ~= burn + (1)
  3. burn || get(hostput)— same but the array never touched device compute
  4. burn || async+get   — copy_to_host_async first, then get
  5. get(tiny)           — fixed round-trip latency floor

Usage:  python -m benchmarks.probe link-semantics
Writes benchmarks/results/link_semantics.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "results")
NBYTES = 1_453_568  # flagship ADPCM wire size


def main():
    import jax
    import jax.numpy as jnp

    A = jax.device_put(np.random.default_rng(0)
                       .standard_normal((1024, 1024)).astype(np.float32))

    def body(c, _):
        return jnp.tanh(c @ A), None

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def burn(c, n):
        return jax.lax.scan(body, c, None, length=n)[0]

    c0 = jax.device_put(np.ones((8, 1024), np.float32))
    # calibrate burn length to ~27 ms (the flagship's compute time)
    np.asarray(burn(c0, 8))
    t0 = time.perf_counter()
    np.asarray(burn(c0, 64))
    per = (time.perf_counter() - t0) / 64
    n_burn = max(8, int(0.027 / per))
    np.asarray(burn(c0, n_burn))  # compile this length
    t0 = time.perf_counter()
    np.asarray(burn(c0, n_burn))
    burn_s = time.perf_counter() - t0

    bump = jax.jit(lambda a: a ^ jnp.uint8(1))
    big = jax.device_put(np.zeros(NBYTES, np.uint8))
    np.asarray(bump(big))  # compile
    tiny_src = jax.device_put(np.zeros(4, np.uint8))
    np.asarray(bump(tiny_src))

    # A jax array caches its host copy after the first fetch, so every
    # timed get below fetches a FRESH array (bump result), synced on
    # device first so only the transfer is timed.
    def fresh(src=None):
        z = bump(big if src is None else src)
        z.block_until_ready()
        return z

    def best(f, n=3):
        return round(min(f() for _ in range(n)), 4)

    def t_get(arr):
        t = time.perf_counter()
        np.asarray(arr)
        return time.perf_counter() - t

    report = {"nbytes": NBYTES, "burn_s": round(burn_s, 4), "n_burn": n_burn}

    report["get_big_alone_s"] = best(lambda: t_get(fresh()))
    report["get_tiny_alone_s"] = best(lambda: t_get(fresh(tiny_src)))

    def burn_then_get(src=None, do_async=False):
        arr = fresh(src)  # device-resident, never fetched
        z = burn(c0, n_burn)  # queued, not synced
        if do_async:
            arr.copy_to_host_async()
        t = time.perf_counter()
        np.asarray(arr)
        got = time.perf_counter() - t
        z.block_until_ready()
        return got

    report["get_big_under_burn_s"] = best(lambda: burn_then_get())
    report["get_big_async_under_burn_s"] = best(
        lambda: burn_then_get(do_async=True)
    )
    report["get_tiny_under_burn_s"] = best(lambda: burn_then_get(tiny_src))

    # end-to-end: queue burn then fetch a fresh big; < burn+get => overlap
    def e2e():
        arr = fresh()
        t = time.perf_counter()
        z = burn(c0, n_burn)
        np.asarray(arr)
        z.block_until_ready()
        return time.perf_counter() - t

    report["e2e_burn_plus_get_s"] = best(e2e)

    verdict = (
        "copies overlap queued compute"
        if report["get_big_under_burn_s"] < report["get_big_alone_s"] + 0.5 * burn_s
        else "strictly in-order: no byte moves until queued compute drains"
    )
    report["verdict"] = verdict

    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "link_semantics.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
