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

    def init_state(self, info):
        if self._H is None:
            return {}
        K, P, bins = self._H.shape
        if self._big_block:
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
        hr = jnp.asarray(self._H)  # [K, P, bins] closure constants
        hi = jnp.asarray(self._Hi)
        # Route input channels to convolver instances, then run all instances
        # as one vmapped batch.
        if self._big_block:
            xs = jnp.stack([x[src] for src in self._conv_inputs])  # [K, T]
            y, new_hist_r, new_hist_i, new_overlap = jax.vmap(
                conv_superblock_big
            )(xs, hr, hi, state["hist_r"], state["hist_i"], state["overlap"])
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
