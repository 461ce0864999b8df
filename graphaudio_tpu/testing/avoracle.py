"""ctypes loader for the test-only ffmpeg decode oracle (avoracle.cpp).

Entirely independent of the shipped codec (native/gacodec.cpp): decodes
via the system's libavformat/libavcodec, so interop tests can prove our
ALAC/FLAC/Ogg bitstreams are readable by a second, widely-deployed
implementation — and that we can read bitstreams that implementation
produced. Returns None when the ffmpeg dev libraries are absent (tests
skip)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from graphaudio_tpu.utils import nativebuild

_lib = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(os.path.dirname(__file__), "avoracle.cpp")
    so = nativebuild.load_or_build(src, ["-lavformat", "-lavcodec", "-lavutil"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.avo_decode.restype = ctypes.POINTER(ctypes.c_float)
    lib.avo_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.avo_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.avo_encode_alac.restype = ctypes.c_int
    lib.avo_encode_alac.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def decode(path) -> Tuple[np.ndarray, int]:
    """Decode ``path`` with ffmpeg; returns (interleaved f32 [frames, ch], rate)."""
    lib = load()
    assert lib is not None
    frames = ctypes.c_int64()
    ch = ctypes.c_int()
    rate = ctypes.c_int()
    p = lib.avo_decode(os.fspath(path).encode(), ctypes.byref(frames),
                       ctypes.byref(ch), ctypes.byref(rate))
    if not p:
        raise RuntimeError(f"ffmpeg oracle failed to decode {path}")
    try:
        n = frames.value * ch.value
        out = np.ctypeslib.as_array(p, shape=(n,)).reshape(
            frames.value, ch.value).copy()
    finally:
        lib.avo_free(p)
    return out, rate.value


def encode_alac(path, samples_i16: np.ndarray, rate: int) -> None:
    """Encode interleaved int16 [frames, ch] as ALAC-in-CAF with ffmpeg's
    own encoder (an independent reference bitstream for our decoder)."""
    lib = load()
    assert lib is not None
    s = np.ascontiguousarray(samples_i16, dtype=np.int16)
    r = lib.avo_encode_alac(
        os.fspath(path).encode(),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        s.shape[0], s.shape[1], int(rate))
    if r != 0:
        raise RuntimeError(f"ffmpeg ALAC encode failed ({r})")
