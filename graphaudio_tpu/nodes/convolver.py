"""Convolution reverb node (parity: GraphAudio.Core/Nodes/ConvolverNode.cs:10).

Setting ``buffer`` builds one partitioned-FFT convolver per IR channel
(ConvolverNode.cs:51-77). A 4-channel IR with ``enable_true_stereo`` becomes a
2-in/2-out True-Stereo matrix: outL = L*ir0 + R*ir2, outR = L*ir1 + R*ir3
(:127-144); otherwise N discrete channels with the input forced to the IR
channel count via Explicit mode (:73-76). The IR's sample rate must match the
context's (:48-49).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphaudio_tpu.core.constants import FRAMES_PER_BLOCK
from graphaudio_tpu.core.node import AudioNode, ChannelCountMode
from graphaudio_tpu.ops.convolve import (
    NUM_BINS,
    conv_superblock,
    conv_superblock_big,
    conv_superblock_big_sharded,
    prepare_ir,
    prepare_ir_big,
)

# Superblocks of >= this many frames partition the IR at superblock grain
# (one 2T-point factorized transform per step) instead of 128-sample grain;
# same linear convolution, far less spectral-MAC traffic for long IRs.
_BIG_BLOCK_MIN = 1024


class ConvolverNode(AudioNode):
    def __init__(self, context):
        super().__init__(context, input_count=1, output_count=1, name="Convolver")
        self._buffer = None
        self._H: Optional[np.ndarray] = None  # [K, P, 129] f32 real spectra
        self._Hi: Optional[np.ndarray] = None  # [K, P, 129] f32 imag spectra
        self._conv_inputs: List[int] = []  # input channel feeding convolver k
        self._is_true_stereo = False
        self._effective_output_channels = 0
        self._big_block = 0  # T when superblock-grain partitioning is active
        self.normalize = True  # parity: ConvolverNode.Normalize (:87)
        self.enable_true_stereo = True  # parity: EnableTrueStereo (:95)

    @property
    def buffer(self):
        return self._buffer

    @buffer.setter
    def buffer(self, value) -> None:
        if value is None:
            self._buffer = None
            self._H = None
            self._Hi = None
            self._conv_inputs = []
            self._is_true_stereo = False
            self._effective_output_channels = 0
            self.inputs[0].set_channel_count_mode(ChannelCountMode.MAX)
            self._config_changed()
            return
        if not value.is_initialized:
            raise RuntimeError(
                "Impulse response buffer must be initialized before being "
                "assigned to the ConvolverNode."
            )
        if value.sample_rate != self.context.sample_rate:
            raise RuntimeError(
                "Impulse response buffer sample rate must match the audio "
                f"context sample rate. IR rate: {value.sample_rate}, context "
                f"rate: {self.context.sample_rate}."
            )
        channels = value.number_of_channels
        T = self.context.superblock * FRAMES_PER_BLOCK
        self._big_block = T if T >= _BIG_BLOCK_MIN else 0
        prep = (
            (lambda ch: prepare_ir_big(ch, self._big_block, self.normalize))
            if self._big_block
            else (lambda ch: prepare_ir(ch, self.normalize))
        )
        prepared = [prep(value.get_channel_data(i)) for i in range(channels)]
        H = np.stack([p[0] for p in prepared])  # [channels, P, bins] real
        Hi = np.stack([p[1] for p in prepared])  # [channels, P, bins] imag
        self._buffer = value
        self._is_true_stereo = channels == 4 and self.enable_true_stereo
        if self._is_true_stereo:
            # Convolvers 0,1 read L; 2,3 read R (ConvolverNode.cs:137-143).
            self._conv_inputs = [0, 0, 1, 1]
            self._H, self._Hi = H, Hi  # order ir0..ir3
            self._effective_output_channels = 2
            self.inputs[0].set_channel_count(2)
        else:
            self._conv_inputs = list(range(channels))
            self._H, self._Hi = H, Hi
            self._effective_output_channels = channels
            self.inputs[0].set_channel_count(channels)
        self.inputs[0].set_channel_count_mode(ChannelCountMode.EXPLICIT)
        self._config_changed()

    def output_channel_counts(self, input_channels):
        if self._H is None:
            return [input_channels[0] if input_channels else 2]
        return [self._effective_output_channels]

    # -- multi-chip partition sharding -----------------------------------------
    #
    # The IR's partition axis splits over the mesh's 'part' axis: each device
    # MACs its own partitions against (replicated) past-input spectra and a
    # psum completes the accumulation — the distributed form of
    # PartitionedConvolver.cs:154-223. Proven standalone in
    # parallel/sharded.ShardedVoiceScene; this is the node-graph integration.

    def supports_part_sharding(self, mesh) -> bool:
        return (
            self._H is not None
            and bool(self._big_block)
            and mesh is not None
            and "part" in mesh.shape
            and int(mesh.shape["part"]) > 1
        )

    def _padded_parts(self, mesh) -> int:
        P = self._H.shape[1]
        if not self.supports_part_sharding(mesh):
            return P
        n = int(mesh.shape["part"])
        return -(-P // n) * n

    def stage_consts(self, mesh) -> dict:
        """IR spectra as stage ARGUMENTS (program-cache reuse on IR swap;
        shardable over 'part'). Zero partitions pad the axis to the mesh's
        'part' size — their MAC contributions are exactly zero."""
        if self._H is None:
            return {}
        Pp = self._padded_parts(mesh)
        K, P, bins = self._H.shape
        if Pp == P:
            return {"conv_hr": self._H, "conv_hi": self._Hi}
        # prepend zero partitions: rows are REVERSED (oldest first), so
        # padding goes before row 0 and the newest-input row stays last.
        pad = ((0, 0), (Pp - P, 0), (0, 0))
        return {
            "conv_hr": np.pad(self._H, pad),
            "conv_hi": np.pad(self._Hi, pad),
        }

    def init_state(self, info):
        if self._H is None:
            return {}
        K, P, bins = self._H.shape
        if self._big_block:
            P = self._padded_parts(getattr(self.context, "mesh", None))
            return {
                "hist_r": np.zeros((K, P - 1, bins), np.float32),
                "hist_i": np.zeros((K, P - 1, bins), np.float32),
                "overlap": np.zeros((K, self._big_block), np.float32),
            }
        return {
            "hist_r": np.zeros((K, P - 1, NUM_BINS), np.float32),
            "hist_i": np.zeros((K, P - 1, NUM_BINS), np.float32),
            "overlap": np.zeros((K, FRAMES_PER_BLOCK), np.float32),
        }

    def process(self, state, inputs, params, rc):
        x = inputs[0]  # [C, T]
        if self._H is None:
            # No IR: cleared output at the input channel count (:107-118).
            return state, [jnp.zeros_like(x)]

        S = rc.superblock
        sc = getattr(rc, "stage_consts", None) or {}
        if "conv_hr" in sc:
            # IR spectra as stage arguments (shardable; cache-reusable).
            # Under 'part' sharding these are this device's partition rows.
            hr = jnp.asarray(sc["conv_hr"])
            hi = jnp.asarray(sc["conv_hi"])
        else:
            hr = jnp.asarray(self._H)  # [K, P, bins] closure constants
            hi = jnp.asarray(self._Hi)
        part_axis = getattr(rc, "part_axis", None)
        # Route input channels to convolver instances, then run all instances
        # as one vmapped batch.
        if self._big_block:
            xs = jnp.stack([x[src] for src in self._conv_inputs])  # [K, T]
            if part_axis:
                conv = lambda *a: conv_superblock_big_sharded(  # noqa: E731
                    *a, part_axis=part_axis
                )
            else:
                conv = conv_superblock_big
            y, new_hist_r, new_hist_i, new_overlap = jax.vmap(conv)(
                xs, hr, hi, state["hist_r"], state["hist_i"], state["overlap"]
            )
            # y: [K, T]
        else:
            xs = jnp.stack(
                [x[src].reshape(S, FRAMES_PER_BLOCK) for src in self._conv_inputs]
            )  # [K, S, 128]
            y, new_hist_r, new_hist_i, new_overlap = jax.vmap(conv_superblock)(
                xs, hr, hi, state["hist_r"], state["hist_i"], state["overlap"]
            )

        if self._is_true_stereo:
            out_l = y[0] + y[2]
            out_r = y[1] + y[3]
            out = jnp.stack([out_l, out_r])
        else:
            out = y

        new_state = {
            "hist_r": new_hist_r,
            "hist_i": new_hist_i,
            "overlap": new_overlap,
        }
        return new_state, [out.reshape(out.shape[0], rc.frames)]
