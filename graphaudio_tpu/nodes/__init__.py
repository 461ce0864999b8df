"""Node library: sources, processors, routing, sink.

Parity inventory vs GraphAudio.Core/Nodes/ (SURVEY.md §2.2):
AudioDestinationNode, GainNode, AudioBufferSourceNode, OscillatorNode,
ConstantSourceNode, BiQuadFilterNode, DelayNode, ConvolverNode,
StereoPannerNode, ChannelSplitterNode, ChannelMergerNode.
"""

from graphaudio_tpu.nodes.destination import AudioDestinationNode
from graphaudio_tpu.nodes.gain import GainNode
from graphaudio_tpu.nodes.sources import (
    ConstantSourceNode,
    OscillatorNode,
    OscillatorType,
    AudioBufferSourceNode,
)
from graphaudio_tpu.nodes.biquad import BiQuadFilterNode, FilterType
from graphaudio_tpu.nodes.delay import DelayNode
from graphaudio_tpu.nodes.panner import StereoPannerNode
from graphaudio_tpu.nodes.channel import ChannelSplitterNode, ChannelMergerNode
from graphaudio_tpu.nodes.convolver import ConvolverNode

__all__ = [
    "AudioDestinationNode",
    "GainNode",
    "ConstantSourceNode",
    "OscillatorNode",
    "OscillatorType",
    "AudioBufferSourceNode",
    "BiQuadFilterNode",
    "FilterType",
    "DelayNode",
    "StereoPannerNode",
    "ChannelSplitterNode",
    "ChannelMergerNode",
    "ConvolverNode",
]
