"""Audio IO: decoding (native codec) and streaming source nodes.

Parity: GraphAudio.IO — libsndfile-backed AudioDecoder
(LibsndfileDecoder.cs) and the double-buffered decoder-thread streaming node
(AudioDecoderStreamNode.cs). The native backend here is our own C++ codec
(native/gacodec.cpp, WAV/AIFF) with a pure-Python WAV fallback.
"""

from graphaudio_tpu.io.decode import AudioDecoder, write_wav
from graphaudio_tpu.io.stream import AudioDecoderStreamNode, StreamState

__all__ = ["AudioDecoder", "write_wav", "AudioDecoderStreamNode", "StreamState"]
