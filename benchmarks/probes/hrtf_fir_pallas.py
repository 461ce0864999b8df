"""Micro-probe round 2: time-domain HRTF FIR, augmented-complex DFT,
and Pallas in-kernel sequential loops (VERDICT items 3/4).

Same measurement discipline as micro_probe.py (two-length scan diffs,
evolving carries, operands as arguments, device_get sync). Writes
benchmarks/results/micro_probe2.json; Pallas failures are captured as
strings, not crashes.

CAVEAT discovered by this probe (now a measurement rule): reducing a
LINEAR function of the inputs to a scalar lets XLA's algebraic simplifier
collapse the function itself — sum(matmul(x, W)) rewrites to dot(x,
sum(W, 1)), so the cdft4096_*_ms timings in the artifact are invalid
(~0 ms) and only the cdft_aug_err figure is meaningful. Bilinear
quantities (fir, the x*h chains) and state-carried loops (the first-order
scans, conv_superblock_big in micro_probe.py) do not collapse and their
timings stand. Sync a timing through a NONLINEAR reduction (e.g.
sum(abs(y))) when y is linear in every argument.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST
F = 128
L = 64  # HRIR taps


def bench(fn, args, n=256):
    jfn = jax.jit(fn, static_argnums=0)

    def timed(steps):
        np.asarray(jax.device_get(jfn(steps, *args)))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(jfn(steps, *args)))
            best = min(best, time.perf_counter() - t0)
        return best

    half = n // 2
    return max((timed(n) - timed(half)) / (n - half), 1e-9)


def main():
    results = {}
    dev = jax.devices()[0]
    print(f"backend={dev.platform}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros(8, jnp.float32)))
    results["warmup_seconds"] = round(time.perf_counter() - t0, 1)
    print(f"warm-up {results['warmup_seconds']} s", flush=True)

    rng = np.random.default_rng(1)
    V, S = 128, 32
    VS = V * S

    # ---- 1) HRTF FIR: unrolled tap loop (XLA) -----------------------------
    xb = jnp.asarray(rng.standard_normal((VS, F + L - 1)).astype(np.float32))
    hb = jnp.asarray(
        (rng.standard_normal((VS, 2, L)) * 0.1).astype(np.float32)
    )

    def fir_taploop(steps, xb, hb):
        def body(carry, _):
            x = xb * (1.0 + carry * 1e-20)
            acc = jnp.zeros((VS, 2, F), jnp.float32)
            for k in range(L):
                acc = acc + hb[:, :, k, None] * x[:, None, L - 1 - k:
                                                  L - 1 - k + F]
            return jnp.sum(acc) * 1e-9, jnp.sum(acc)

        c, outs = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return jnp.sum(outs) + c

    results["fir_taploop_ms"] = round(bench(fir_taploop, (xb, hb)) * 1e3, 4)
    print("fir taploop:", results["fir_taploop_ms"], flush=True)

    # accuracy vs f64
    def one_taploop(xb, hb):
        acc = jnp.zeros((VS, 2, F), jnp.float32)
        for k in range(L):
            acc = acc + hb[:, :, k, None] * x_slice(xb, k)
        return acc

    def x_slice(xb, k):
        return xb[:, None, L - 1 - k: L - 1 - k + F]

    y = np.asarray(jax.jit(one_taploop)(xb, hb), np.float64)
    xb64 = np.asarray(xb, np.float64)
    hb64 = np.asarray(hb, np.float64)
    ref = np.zeros((VS, 2, F))
    for k in range(L):
        ref += hb64[:, :, k, None] * xb64[:, None, L - 1 - k: L - 1 - k + F]
    results["fir_taploop_err"] = float(
        np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    )
    print("fir taploop err:", results["fir_taploop_err"], flush=True)

    # ---- 2) HRTF FIR in Pallas --------------------------------------------
    try:
        from jax.experimental import pallas as pl

        BS = 256  # rows per grid step

        def fir_kernel(x_ref, h_ref, o_ref):
            x = x_ref[...]  # [BS, F + L - 1]
            h = h_ref[...]  # [BS, 2 * L]
            acc0 = jnp.zeros((BS, F), jnp.float32)
            acc1 = jnp.zeros((BS, F), jnp.float32)
            for k in range(L):
                xs = x[:, L - 1 - k: L - 1 - k + F]
                acc0 = acc0 + h[:, k: k + 1] * xs
                acc1 = acc1 + h[:, L + k: L + k + 1] * xs
            o_ref[:, :F] = acc0
            o_ref[:, F:] = acc1

        hflat = hb.reshape(VS, 2 * L)

        def fir_pallas_call(x, h):
            return pl.pallas_call(
                fir_kernel,
                out_shape=jax.ShapeDtypeStruct((VS, 2 * F), jnp.float32),
                grid=(VS // BS,),
                in_specs=[
                    pl.BlockSpec((BS, F + L - 1), lambda i: (i, 0)),
                    pl.BlockSpec((BS, 2 * L), lambda i: (i, 0)),
                ],
                out_specs=pl.BlockSpec((BS, 2 * F), lambda i: (i, 0)),
            )(x, h)

        def fir_pallas(steps, xb, hflat):
            def body(carry, _):
                x = xb * (1.0 + carry * 1e-20)
                y = fir_pallas_call(x, hflat)
                return jnp.sum(y) * 1e-9, jnp.sum(y)

            c, outs = jax.lax.scan(body, jnp.float32(0), None, length=steps)
            return jnp.sum(outs) + c

        yp = np.asarray(
            jax.jit(fir_pallas_call)(xb, hflat), np.float64
        ).reshape(VS, 2, F)
        err = np.max(np.abs(yp - ref)) / np.max(np.abs(ref))
        results["fir_pallas_err"] = float(err)
        results["fir_pallas_ms"] = round(
            bench(fir_pallas, (xb, hflat)) * 1e3, 4
        )
        print("fir pallas:", results["fir_pallas_ms"],
              "err", results["fir_pallas_err"], flush=True)
    except Exception:
        results["fir_pallas_error"] = traceback.format_exc()[-1500:]
        print("fir pallas FAILED:\n", results["fir_pallas_error"], flush=True)

    # ---- 3) ComplexDft: current 4-matmul form vs augmented-real form ------
    from graphaudio_tpu.ops.fft import ComplexDft

    n = 4096
    cd = ComplexDft(n)
    n1, n2 = cd.n1, cd.n2
    xr = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def dft_current(steps, xr, xi):
        def body(carry, _):
            a, b = cd(xr * (1.0 + carry * 1e-20), xi)
            return jnp.sum(a) * 1e-9, jnp.sum(a) + jnp.sum(b)

        c, outs = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return jnp.sum(outs) + c

    results["cdft4096_current_ms"] = round(
        bench(dft_current, (xr, xi)) * 1e3, 4
    )

    # augmented: stage matmuls on [.., 2n] packed operands
    w1 = np.block([[cd._w1r, cd._w1i], [-cd._w1i, cd._w1r]]).astype(np.float32)
    w2 = np.block([[cd._w2r, cd._w2i], [-cd._w2i, cd._w2r]]).astype(np.float32)
    w1j = jnp.asarray(w1)
    w2j = jnp.asarray(w2)
    twr = jnp.asarray(cd._twr)
    twi = jnp.asarray(cd._twi)

    def cdft_aug(xr, xi):
        lead = xr.shape[:-1]
        a = xr.reshape(lead + (n1, n2))
        b = xi.reshape(lead + (n1, n2))
        # stage 1: contraction over j1 -> transpose j1 last, pack
        p = jnp.concatenate(
            [jnp.swapaxes(a, -1, -2), jnp.swapaxes(b, -1, -2)], axis=-1
        )  # [.., n2, 2*n1]
        y = jnp.matmul(p, w1j, precision=HIGHEST)  # [.., n2, 2*n1]
        yr = jnp.swapaxes(y[..., :n1], -1, -2)  # [.., n1, n2]
        yi = jnp.swapaxes(y[..., n1:], -1, -2)
        zr = yr * twr - yi * twi
        zi = yr * twi + yi * twr
        q = jnp.concatenate([zr, zi], axis=-1)  # [.., n1, 2*n2]
        v = jnp.matmul(q, w2j, precision=HIGHEST)
        vr = jnp.swapaxes(v[..., :n2], -1, -2).reshape(lead + (n,))
        vi = jnp.swapaxes(v[..., n2:], -1, -2).reshape(lead + (n,))
        return vr, vi

    def dft_aug(steps, xr, xi):
        def body(carry, _):
            a, b = cdft_aug(xr * (1.0 + carry * 1e-20), xi)
            return jnp.sum(a) * 1e-9, jnp.sum(a) + jnp.sum(b)

        c, outs = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return jnp.sum(outs) + c

    ar, ai = jax.jit(cd.__call__)(xr, xi)
    br2, bi2 = jax.jit(cdft_aug)(xr, xi)
    scale = float(np.max(np.abs(np.asarray(ar))))
    results["cdft_aug_err"] = float(
        max(
            np.max(np.abs(np.asarray(ar) - np.asarray(br2))),
            np.max(np.abs(np.asarray(ai) - np.asarray(bi2))),
        )
        / scale
    )
    results["cdft4096_aug_ms"] = round(bench(dft_aug, (xr, xi)) * 1e3, 4)
    print("cdft:", results["cdft4096_current_ms"],
          results["cdft4096_aug_ms"], "err", results["cdft_aug_err"],
          flush=True)

    # ---- 4) Pallas first-order complex recurrence vs associative scan -----
    B = 128  # blocks on the lane axis
    T = 128  # in-block sequential steps
    xrb = jnp.asarray(rng.standard_normal((T, B)).astype(np.float32))
    xib = jnp.asarray(rng.standard_normal((T, B)).astype(np.float32))
    theta = rng.uniform(0, np.pi, B)
    r = rng.uniform(0.9, 0.999, B)
    arb = jnp.asarray((r * np.cos(theta)).astype(np.float32))[None, :]
    aib = jnp.asarray((r * np.sin(theta)).astype(np.float32))[None, :]

    def scan_ref(xr, xi, ar, ai):
        # associative first-order scan over t (the current inner level)
        def comb(u, v):
            (uar, uai, ubr, ubi) = u
            (var, vai, vbr, vbi) = v
            nar = var * uar - vai * uai
            nai = var * uai + vai * uar
            nbr = var * ubr - vai * ubi + vbr
            nbi = var * ubi + vai * ubr + vbi
            return nar, nai, nbr, nbi

        ones = jnp.broadcast_to(ar, xr.shape)
        onesi = jnp.broadcast_to(ai, xr.shape)
        a4 = (ones, onesi, xr, xi)
        res = jax.lax.associative_scan(comb, a4, axis=0)
        return res[2], res[3]

    def scan_bench(steps, xr, xi, ar, ai):
        def body(carry, _):
            yr, yi = scan_ref(xr * (1.0 + carry * 1e-20), xi, ar, ai)
            return jnp.sum(yr) * 1e-9, jnp.sum(yr) + jnp.sum(yi)

        c, outs = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return jnp.sum(outs) + c

    results["fo_scan_ms"] = round(
        bench(scan_bench, (xrb, xib, arb, aib)) * 1e3, 4
    )
    print("first-order assoc scan:", results["fo_scan_ms"], flush=True)

    try:
        from jax.experimental import pallas as pl

        def fo_kernel(xr_ref, xi_ref, ar_ref, ai_ref, or_ref, oi_ref):
            ar = ar_ref[...]  # [1, B]
            ai = ai_ref[...]
            sr = jnp.zeros((1, B), jnp.float32)
            si = jnp.zeros((1, B), jnp.float32)
            for t in range(T):
                xr_t = xr_ref[t: t + 1, :]
                xi_t = xi_ref[t: t + 1, :]
                nsr = ar * sr - ai * si + xr_t
                nsi = ar * si + ai * sr + xi_t
                sr, si = nsr, nsi
                or_ref[t: t + 1, :] = sr
                oi_ref[t: t + 1, :] = si

        def fo_pallas_call(xr, xi, ar, ai):
            return pl.pallas_call(
                fo_kernel,
                out_shape=(
                    jax.ShapeDtypeStruct((T, B), jnp.float32),
                    jax.ShapeDtypeStruct((T, B), jnp.float32),
                ),
            )(xr, xi, ar, ai)

        yr_p, yi_p = jax.jit(fo_pallas_call)(xrb, xib, arb, aib)
        yr_s, yi_s = jax.jit(scan_ref)(xrb, xib, arb, aib)
        err = max(
            float(np.max(np.abs(np.asarray(yr_p) - np.asarray(yr_s)))),
            float(np.max(np.abs(np.asarray(yi_p) - np.asarray(yi_s)))),
        )
        results["fo_pallas_err_vs_scan"] = err

        def fo_pallas_bench(steps, xr, xi, ar, ai):
            def body(carry, _):
                yr, yi = fo_pallas_call(
                    xr * (1.0 + carry * 1e-20), xi, ar, ai
                )
                return jnp.sum(yr) * 1e-9, jnp.sum(yr) + jnp.sum(yi)

            c, outs = jax.lax.scan(body, jnp.float32(0), None, length=steps)
            return jnp.sum(outs) + c

        results["fo_pallas_ms"] = round(
            bench(fo_pallas_bench, (xrb, xib, arb, aib)) * 1e3, 4
        )
        print("first-order pallas:", results["fo_pallas_ms"],
              "err vs scan", err, flush=True)
    except Exception:
        results["fo_pallas_error"] = traceback.format_exc()[-1500:]
        print("fo pallas FAILED:\n", results["fo_pallas_error"], flush=True)

    from benchmarks.artifacts import write_artifact

    results["backend"] = dev.platform
    write_artifact("micro_probe2", results)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
