"""Graph sink (parity: GraphAudio.Core/Nodes/AudioDestinationNode.cs:9)."""

from __future__ import annotations

from graphaudio_tpu.core.constants import MAX_CHANNELS
from graphaudio_tpu.core.node import AudioNode


class AudioDestinationNode(AudioNode):
    """Final output: one input, no outputs, default stereo.

    The compiler treats the destination's mixed input as the render output
    (the reference passes the input buffer through, AudioDestinationNode.cs:42-64).
    """

    def __init__(self, context):
        super().__init__(context, input_count=1, output_count=0, name="AudioDestination")
        self.inputs[0].set_channel_count(2)

    def set_channel_count(self, channels: int) -> None:
        """Parity: AudioDestinationNode.SetChannelCount (:23-32)."""
        if not (1 <= channels <= MAX_CHANNELS):
            raise ValueError(f"channels must be in [1, {MAX_CHANNELS}]")
        self.inputs[0].set_channel_count(channels)

    def process(self, state, inputs, params, rc):
        # Never called: the compiler special-cases the destination.
        return state, []
