"""Channel up/down-mixing rules for fan-in summing junctions.

Parity: GraphAudio.Core/AudioNodeInput.MixBuffer (AudioNodeInput.cs:182-244):
  * equal channel counts        -> per-channel add
  * mono -> N                   -> broadcast the mono channel into every one
  * N -> mono                   -> sum channels, scaled by 1/sqrt(N)
  * otherwise                   -> add the first min(src, dst) channels

(The reference's ChannelInterpretation parameter is accepted but unused by its
MixBuffer; we keep the same behavior for parity.)

All functions are pure jnp ops over [channels, T] planar blocks; XLA fuses the
fan-in sums of a whole graph level into single kernels.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def adapt_channels(src, dst_channels: int):
    """Return ``src`` re-channelled to ``dst_channels`` per the mixing rules.

    src: f32[src_channels, T]. Result: f32[dst_channels, T] such that adding
    it into an accumulator reproduces MixBuffer's contribution.
    """
    src_channels = src.shape[0]
    if src_channels == dst_channels:
        return src
    if src_channels == 1 and dst_channels > 1:
        # mono -> N: broadcast add (AudioNodeInput.cs:201-213)
        return jnp.broadcast_to(src, (dst_channels,) + src.shape[1:])
    if src_channels > 1 and dst_channels == 1:
        # N -> mono: sum * 1/sqrt(N) (AudioNodeInput.cs:214-228)
        scale = jnp.float32(1.0 / math.sqrt(src_channels))
        return jnp.sum(src, axis=0, keepdims=True) * scale
    # discrete fallback: first min(src, dst) channels (AudioNodeInput.cs:229-243)
    n = min(src_channels, dst_channels)
    out = src[:n]
    if n < dst_channels:
        pad = jnp.zeros((dst_channels - n,) + src.shape[1:], dtype=src.dtype)
        out = jnp.concatenate([out, pad], axis=0)
    return out


# The fan-in summing junction itself (AudioNodeInput.Pull,
# AudioNodeInput.cs:100-138) lives in the compiled step — see
# graph.py mixed_signal, which is the single implementation (it adds
# group-lane collapsing and mesh psum completion on top of
# adapt_channels).


def resolve_channel_count(mode: str, node_channel_count: int, source_channel_counts) -> int:
    """Static channel-count resolution for an input port.

    Parity: AudioNodeInput.ComputeOutputChannelCount (AudioNodeInput.cs:140-168)
    with the dynamic buffer inspection replaced by the compile-time channel
    counts of connected outputs.
    """
    counts = [c for c in source_channel_counts if c is not None]
    if mode == "explicit":
        return node_channel_count
    if mode == "clamped-max":
        m = max(counts) if counts else 0
        return min(m if m > 0 else node_channel_count, node_channel_count)
    # "max"
    m = node_channel_count
    for c in counts:
        m = max(m, c)
    return m
