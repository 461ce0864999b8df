"""Audio IO: decoding (native codec) and streaming source nodes.

Parity: GraphAudio.IO — libsndfile-backed AudioDecoder (ours decodes
WAV/RF64/Wave64/AIFF/AU/CAF/FLAC/IMA+MS-ADPCM natively, plus MP3,
Ogg/Vorbis, and Ogg Opus through the system's libmpg123 / libvorbisfile /
libogg+libopus, dlopen'd at runtime; see codec_capabilities())
(LibsndfileDecoder.cs) and the double-buffered decoder-thread streaming node
(AudioDecoderStreamNode.cs). The native backend here is our own C++ codec
(native/gacodec.cpp) with a pure-Python WAV fallback; encoders cover
WAV/FLAC/MP3/Ogg/Opus.
"""

from graphaudio_tpu.io.decode import (
    AudioDecoder,
    codec_capabilities,
    write_aiff,
    write_alac,
    write_au,
    write_caf,
    write_flac,
    write_mp3,
    write_ogg,
    write_opus,
    write_wav,
)
from graphaudio_tpu.io.stream import AudioDecoderStreamNode, StreamState

__all__ = [
    "AudioDecoder",
    "codec_capabilities",
    "write_aiff",
    "write_alac",
    "write_au",
    "write_caf",
    "write_flac",
    "write_mp3",
    "write_ogg",
    "write_opus",
    "write_wav",
    "AudioDecoderStreamNode",
    "StreamState",
]
