"""Catmull-Rom cubic resampling as static-shape gathers.

The reference's ``CubicResampler`` (GraphAudio.Core/CubicResampler.cs:19) is a
stateful per-sample loop: a 4-sample history window slides over the input at a
fractional rate, producing each output from a Catmull-Rom polynomial of the
window (:52-57). Sequential input consumption is hostile to TPUs, so here the
window position is computed in closed form — after the 4-sample warmup the
j-th output interpolates at continuous input position

    x_j = x_0 + j * rate        (x_0 = start_position + 1 after priming)

and the output is a 4-tap gather at floor(x_j) + {-1, 0, 1, 2} with the same
polynomial. Positions are float64 (the reference keeps ``Pos`` as a double);
the polynomial is evaluated in float32 like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def catmull_rom(s0, s1, s2, s3, t):
    """The reference's cubic kernel (CubicResampler.cs:52-57), float32.

    out = S1 + t*(0.5(S2-S0) + t*((S0 - 2.5 S1 + 2 S2 - 0.5 S3)
                                   + t*(0.5(S3-S0) + 1.5(S1-S2))))
    """
    t = t.astype(jnp.float32)
    return s1 + t * (
        0.5 * (s2 - s0)
        + t * ((s0 - 2.5 * s1 + 2.0 * s2 - 0.5 * s3) + t * (0.5 * (s3 - s0) + 1.5 * (s1 - s2)))
    )


def gather_resample(data, x, loop_active, loop_start, loop_end, loop_len):
    """Resample ``data`` at continuous positions ``x`` with loop wrapping.

    Args:
      data: f32[C, L] source samples.
      x: f64[...] continuous positions (already wrapped into the loop region
        for the base position; taps crossing the loop end are re-wrapped here,
        mirroring the reference's 512-sample wrap buffer at the seam,
        AudioBufferSourceNode.cs:297-313).
      loop_active: bool[] or scalar — whether loop wrapping applies.
      loop_start, loop_end, loop_len: f64 loop region in frames.

    Returns f32[C, ...] interpolated samples.
    """
    base = jnp.floor(x)
    t = (x - base).astype(jnp.float32)
    length = data.shape[1]
    safe_len = jnp.maximum(loop_len, 1.0)

    taps = []
    for k in (-1.0, 0.0, 1.0, 2.0):
        tk = base + k
        # Modular wrap in both directions keeps the 4-tap window continuous
        # across the loop seam (the reference's history carries end-of-loop
        # samples into the restart, AudioBufferSourceNode.cs:297-313).
        tk = jnp.where(
            loop_active,
            loop_start + jnp.mod(tk - loop_start, safe_len),
            tk,
        )
        tk = jnp.clip(tk, 0.0, float(length - 1)).astype(jnp.int32)
        taps.append(tk)

    flat = [jnp.take(data, tk.reshape(-1), axis=1).reshape((data.shape[0],) + x.shape)
            for tk in taps]
    return catmull_rom(flat[0], flat[1], flat[2], flat[3], t)
