"""Gain node (parity: GraphAudio.Core/Nodes/GainNode.cs:9)."""

from __future__ import annotations

from graphaudio_tpu.core.node import AudioNode
from graphaudio_tpu.core.params import AutomationRate


class GainNode(AudioNode):
    """out = in * a-rate gain (GainNode.cs:48-58). Unbounded gain, default 1."""

    def __init__(self, context):
        super().__init__(context, input_count=1, output_count=1, name="Gain")
        self.gain = self.create_audio_param(
            "gain", default_value=1.0, automation_rate=AutomationRate.A_RATE
        )

    def group_key(self, input_channels):
        return ("gain", input_channels[0], self._mod_signature())

    def process(self, state, inputs, params, rc):
        g = params["gain"].per_sample()  # f32[T]
        return state, [inputs[0] * g[None, :]]
