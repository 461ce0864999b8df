"""Delay node (parity: GraphAudio.Core/Nodes/DelayNode.cs:9).

The reference keeps a per-channel circular buffer and, per sample, reads at an
integer a-rate delay then writes the input (:66-91); a delay of zero reads
silence (:143-144). There is no feedback path (graph cycles are rejected), so
the recurrence is only apparent: sample i either reads this block's own input
at i - d_i (when d_i <= i) or the carried ring — both are static gathers.

State: ring f32[C, L] plus a write cursor; the ring is updated once per
superblock with a wraparound scatter.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from graphaudio_tpu.core.node import AudioNode
from graphaudio_tpu.core.params import AutomationRate

MAX_DELAY_SECONDS = 10  # parity: DelayNode.cs:11


class DelayNode(AudioNode):
    def __init__(self, context, max_delay_time: float = 1.0):
        if not (0 < max_delay_time <= MAX_DELAY_SECONDS):
            raise ValueError(f"max_delay_time must be in (0, {MAX_DELAY_SECONDS}]")
        super().__init__(context, input_count=1, output_count=1, name="Delay")
        self._max_delay_samples = int(max_delay_time * context.sample_rate)
        self.delay_time = self.create_audio_param(
            "delayTime",
            0.0,
            min_value=0.0,
            max_value=float(max_delay_time),
            automation_rate=AutomationRate.A_RATE,
        )
        # The integer-sample truncation amplifies 1-ulp value noise into
        # full-sample read differences; linear curves evaluate in f64.
        self.delay_time.exact_eval = True
        self._channels = 2  # updated at compile via output_channel_counts

    def output_channel_counts(self, input_channels):
        c = input_channels[0] if input_channels else 2
        self._channels = c
        return [c]

    def init_state(self, info):
        L = self._max_delay_samples
        return {
            "ring": np.zeros((self._channels, L), np.float32),
            "wpos": np.int32(0),
        }

    def process(self, state, inputs, params, rc):
        x = inputs[0]  # [C, T]
        C, T = x.shape
        ring = state["ring"]
        L = ring.shape[1]
        w = state["wpos"]

        # Integer truncation of the float32 product delayTime*sr, clamped —
        # float32 multiply for parity with the reference (DelayNode.cs:68-69).
        d = (params["delayTime"].per_sample() * jnp.float32(rc.sample_rate)
             ).astype(jnp.int32)
        d = jnp.clip(d, 0, self._max_delay_samples)

        i = jnp.arange(T, dtype=jnp.int32)
        shifted = i - d  # source index within this superblock
        from_input = shifted >= 0
        in_gather = jnp.take(x, jnp.clip(shifted, 0, T - 1), axis=1)
        ring_idx = jnp.mod(w + shifted, L)
        ring_gather = jnp.take(ring, ring_idx, axis=1)
        out = jnp.where(from_input[None, :], in_gather, ring_gather)
        # Zero delay reads silence (DelayNode.cs:143-144).
        out = jnp.where((d <= 0)[None, :], 0.0, out)

        # Write this superblock's input into the ring (read-before-write
        # semantics preserved because reads above never touch indices
        # >= current position). When T >= L only the trailing L samples
        # survive, so write exactly those (avoids duplicate scatter indices).
        if T >= L:
            k = jnp.arange(L, dtype=jnp.int32)
            write_idx = jnp.mod(w + (T - L) + k, L)
            new_ring = ring.at[:, write_idx].set(x[:, T - L :])
        else:
            write_idx = jnp.mod(w + i, L)
            new_ring = ring.at[:, write_idx].set(x)
        new_wpos = jnp.mod(w + T, L).astype(jnp.int32)

        return {"ring": new_ring, "wpos": new_wpos}, [out]
