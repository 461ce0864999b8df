"""Game-facing toolkit (parity: GraphAudio.Kit, SURVEY.md §2.6).

AudioEngine / Sound hierarchy / hierarchical AudioBus / EffectChain /
ReverbEffect / LRU buffer cache / data providers / spatial anchors /
step-linear 2-D spatialization / distance-blend controllers.
"""

from graphaudio_tpu.kit.engine import AudioEngine
from graphaudio_tpu.kit.sound import Sound, BufferedSound, StreamingSound, SoundMixState
from graphaudio_tpu.kit.bus import AudioBus
from graphaudio_tpu.kit.effects import Effect, NodeEffect, EffectChain, ReverbEffect
from graphaudio_tpu.kit.cache import AudioBufferCache, AudioBufferCacheOptions
from graphaudio_tpu.kit.anchors import (
    SpatialAnchor,
    StepLinearConfig,
    step_linear_calculate,
    SpatialBlendController,
    DefaultSpatialBlendController,
    LinearSpatialBlendController,
)
from graphaudio_tpu.kit.providers import DataProvider, FileSystemDataProvider

__all__ = [
    "AudioEngine",
    "Sound",
    "BufferedSound",
    "StreamingSound",
    "SoundMixState",
    "AudioBus",
    "Effect",
    "NodeEffect",
    "EffectChain",
    "ReverbEffect",
    "AudioBufferCache",
    "AudioBufferCacheOptions",
    "SpatialAnchor",
    "StepLinearConfig",
    "step_linear_calculate",
    "SpatialBlendController",
    "DefaultSpatialBlendController",
    "LinearSpatialBlendController",
    "DataProvider",
    "FileSystemDataProvider",
]
