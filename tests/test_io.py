"""IO: native codec decode, WAV write, streaming node."""

import numpy as np
import pytest

import graphaudio_tpu as ga
from graphaudio_tpu.io import AudioDecoder, AudioDecoderStreamNode, StreamState, write_wav
from graphaudio_tpu.io.decode import _PyWavReader

SR = 48000


@pytest.fixture
def wav_file(tmp_path, rng):
    sig = (rng.standard_normal((2, 12000)) * 0.4).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, sig, SR, float32=True)
    return str(path), sig


def test_decode_roundtrip(wav_file):
    path, sig = wav_file
    with AudioDecoder(path) as dec:
        assert dec.channels == 2
        assert dec.sample_rate == SR
        assert dec.frames == 12000
        assert abs(dec.duration - 0.25) < 1e-9
        planar = dec.decode_planar(12000)
        assert np.array_equal(planar, sig)


def test_decode_pcm16(tmp_path, rng):
    sig = (rng.standard_normal(5000) * 0.4).astype(np.float32)
    path = tmp_path / "p.wav"
    write_wav(path, sig[None], SR, float32=False)
    buf = AudioDecoder.load_from_file(path)
    assert buf.number_of_channels == 1
    # PCM16 write clips to [-1, 1] and quantizes.
    assert np.abs(buf.data[0] - np.clip(sig, -1, 1)).max() < 1e-4


def test_decode_from_bytes(wav_file):
    path, sig = wav_file
    with open(path, "rb") as f:
        data = f.read()
    buf = AudioDecoder.load_from_bytes(data)
    assert np.array_equal(buf.data, sig)


def test_seek(wav_file):
    path, sig = wav_file
    with AudioDecoder(path) as dec:
        assert dec.try_seek(0.1)
        got = dec.decode_planar(100)
        assert np.array_equal(got, sig[:, 4800:4900])
        assert dec.try_rewind()
        got = dec.decode_planar(10)
        assert np.array_equal(got, sig[:, :10])


def test_python_fallback_reader(wav_file):
    path, sig = wav_file
    with open(path, "rb") as f:
        r = _PyWavReader(f.read())
    assert r.channels == 2 and r.sample_rate == SR and r.frames == 12000
    got = r.read(12000).T
    assert np.array_equal(got, sig)


def test_stream_node_unity(wav_file):
    path, sig = wav_file
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    node = AudioDecoderStreamNode.from_file(ctx, path)
    node.connect(ctx.destination)
    assert node.state == StreamState.STOPPED
    node.play()
    out = ctx.render(2048)
    assert np.array_equal(out[0], sig[0, :2048])
    assert np.array_equal(out[1], sig[1, :2048])
    node.pause()
    assert node.state == StreamState.PAUSED
    node.play()
    out2 = ctx.render(2048)
    assert np.array_equal(out2[0], sig[0, 2048:4096])


def test_stream_node_resample(tmp_path, rng):
    sig = (rng.standard_normal(30000) * 0.4).astype(np.float32)
    path = tmp_path / "s.wav"
    write_wav(path, sig[None], 44100, float32=True)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    ctx.destination.set_channel_count(1)
    ctx.destination.inputs[0].set_channel_count_mode(ga.ChannelCountMode.EXPLICIT)
    node = AudioDecoderStreamNode.from_file(ctx, str(path))
    node.connect(ctx.destination)
    node.play()
    out = np.concatenate([ctx.render(2048)[0], ctx.render(2048)[0]])
    rate = 44100.0 / SR
    from tests.test_resample import _golden_resample

    expect = _golden_resample(sig, rate, 4096, start_pos=0.0)
    assert np.abs(out - expect).max() < 1e-5


def test_stream_node_end_stops(tmp_path, rng):
    sig = (rng.standard_normal(3000) * 0.4).astype(np.float32)
    path = tmp_path / "e.wav"
    write_wav(path, sig[None], SR, float32=True)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    node = AudioDecoderStreamNode.from_file(ctx, str(path))
    node.connect(ctx.destination)
    node.play()
    out = ctx.render(4096)
    assert np.allclose(out[0, 3000:], 0.0)
    assert node.state == StreamState.STOPPED


def test_stream_node_loop(tmp_path, rng):
    sig = (rng.standard_normal(3000) * 0.4).astype(np.float32)
    path = tmp_path / "l.wav"
    write_wav(path, sig[None], SR, float32=True)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    node = AudioDecoderStreamNode.from_file(ctx, str(path))
    node.loop = True
    node.connect(ctx.destination)
    node.play()
    out = ctx.render(9216)[0]
    expect = sig[np.arange(9216) % 3000]
    assert np.array_equal(out, expect)


# -- compressed codecs (system libmpg123 / libvorbis via the native layer) ----

def _tone(frames, hz=(440.0, 880.0)):
    t = np.arange(frames) / SR
    return np.stack([np.sin(2 * np.pi * h * t) for h in hz]).astype(np.float32) * 0.5


def _codec_roundtrip(path, writer, decode_exact):
    from graphaudio_tpu.io import codec_capabilities
    sig = _tone(SR)
    writer(path, sig, SR)
    with AudioDecoder(str(path)) as dec:
        assert dec.channels == 2 and dec.sample_rate == SR
        if decode_exact:
            assert dec.frames == SR  # gapless / sample-accurate length
        out = dec.decode(dec.frames).T  # [2, n]
    m = min(out.shape[1], SR)
    for c in range(2):
        a = out[c, :m] - out[c, :m].mean()
        b = sig[c, :m] - sig[c, :m].mean()
        corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert corr > 0.99, f"channel {c} decorrelated: {corr}"
    # seek + re-read stays in bounds and keeps playing
    with AudioDecoder(str(path)) as dec:
        assert dec.try_seek(0.5)
        chunk = dec.decode(256)
        assert chunk.shape[0] == 256


def test_mp3_roundtrip(tmp_path):
    from graphaudio_tpu.io import codec_capabilities, write_mp3
    caps = codec_capabilities()
    if not (caps["mp3"] and caps["mp3_encode"]):
        pytest.skip("system mp3 codec unavailable")
    _codec_roundtrip(tmp_path / "t.mp3", lambda p, d, sr: write_mp3(p, d, sr), True)


def test_ogg_roundtrip(tmp_path):
    from graphaudio_tpu.io import codec_capabilities, write_ogg
    caps = codec_capabilities()
    if not (caps["ogg"] and caps["ogg_encode"]):
        pytest.skip("system vorbis codec unavailable")
    _codec_roundtrip(tmp_path / "t.ogg", lambda p, d, sr: write_ogg(p, d, sr), True)


def test_flac_roundtrip(tmp_path):
    from graphaudio_tpu.io import codec_capabilities, write_flac
    caps = codec_capabilities()
    if not (caps.get("flac") and caps.get("flac_encode")):
        pytest.skip("native codec unavailable")
    _codec_roundtrip(tmp_path / "t.flac", lambda p, d, sr: write_flac(p, d, sr), True)


def test_flac_lossless_at_bit_depth(tmp_path):
    """FLAC is lossless: decode returns exactly the quantized samples."""
    from graphaudio_tpu.io import codec_capabilities, write_flac
    caps = codec_capabilities()
    if not (caps.get("flac") and caps.get("flac_encode")):
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(11)
    for bits in (16, 24):
        sig = (rng.standard_normal((2, 10000)) * 0.4).astype(np.float32)
        path = tmp_path / f"t{bits}.flac"
        write_flac(path, sig, SR, bits=bits)
        q = np.clip(
            np.rint(sig.astype(np.float64) * (1 << (bits - 1))),
            -(1 << (bits - 1)), (1 << (bits - 1)) - 1,
        )
        expect = (q / (1 << (bits - 1))).astype(np.float32)
        with AudioDecoder(str(path)) as dec:
            assert dec.frames == 10000
            out = dec.decode(dec.frames).T
        assert out.shape == expect.shape
        assert np.array_equal(out, expect), f"bits={bits} not lossless"


def test_flac_constant_and_seek(tmp_path):
    """Constant subframes + decode-and-discard seeking."""
    from graphaudio_tpu.io import codec_capabilities, write_flac
    caps = codec_capabilities()
    if not (caps.get("flac") and caps.get("flac_encode")):
        pytest.skip("native codec unavailable")
    sig = np.concatenate(
        [np.full(5000, 0.25, np.float32), np.zeros(5000, np.float32)]
    )[None, :]
    path = tmp_path / "c.flac"
    write_flac(path, sig, SR)
    with AudioDecoder(str(path)) as dec:
        assert dec.channels == 1 and dec.frames == 10000
        assert dec.try_seek(4096 / SR)
        chunk = dec.decode(128)[:, 0]
        assert np.allclose(chunk, np.float32(0.25), atol=2 / 32768)
        # backward seek rewinds and re-decodes
        assert dec.try_rewind()
        chunk = dec.decode(128)[:, 0]
        assert np.allclose(chunk, np.float32(0.25), atol=2 / 32768)


def test_mp3_stream_node(tmp_path):
    """Compressed formats feed the streaming node end-to-end."""
    from graphaudio_tpu.io import codec_capabilities, write_mp3
    caps = codec_capabilities()
    if not (caps["mp3"] and caps["mp3_encode"]):
        pytest.skip("system mp3 codec unavailable")
    sig = _tone(SR)
    path = tmp_path / "s.mp3"
    write_mp3(path, sig, SR)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    node = AudioDecoderStreamNode.from_file(ctx, str(path))
    node.connect(ctx.destination)
    node.play()
    out = ctx.render(8192)
    spec = np.abs(np.fft.rfft(out[0]))
    peak_hz = spec.argmax() * SR / out.shape[1]
    assert abs(peak_hz - 440.0) < 10.0


def test_aiff_decode(tmp_path, rng):
    """Native AIFF parser: hand-built AIFF-PCM16 big-endian file."""
    import struct
    sig = (rng.standard_normal(2000) * 0.4).astype(np.float32)
    pcm = np.clip(sig * 32767.0, -32768, 32767).astype(">i2")
    frames, ch, bits = len(sig), 1, 16
    # 80-bit IEEE extended sample rate (48000 = 0x400E BB80...)
    ext = struct.pack(">HQ", 0x400E, 0xBB80000000000000)
    comm = struct.pack(">hIh", ch, frames, bits) + ext
    ssnd = struct.pack(">II", 0, 0) + pcm.tobytes()
    body = (b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    data = b"FORM" + struct.pack(">I", 4 + len(body) - 4) + body
    path = tmp_path / "t.aiff"
    path.write_bytes(data)
    with AudioDecoder(str(path)) as dec:
        assert dec.channels == 1 and dec.sample_rate == 48000
        assert dec.frames == frames
        out = dec.decode(frames)[:, 0]
    assert np.abs(out - pcm.astype(np.float32) / 32768.0).max() < 1e-6


# ---- malformed/hostile container inputs (must reject, never crash) ----------


def _open_mem(payload: bytes):
    """Open raw bytes with the native codec; returns a handle or None."""
    import ctypes

    from graphaudio_tpu.io import native

    lib = native.load()
    if lib is None:
        pytest.skip("no native codec on this machine")
    h = lib.gac_open_memory(payload, len(payload))
    if h:
        lib.gac_close(h)
    return h


def _wav_bytes(fmt_payload: bytes, data: bytes = b"\x00" * 64) -> bytes:
    import struct

    chunks = b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
    if len(fmt_payload) % 2:
        chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _fmt(tag=1, channels=2, rate=48000, bits=16, extra=b"") -> bytes:
    import struct

    block = channels * (bits // 8) if bits >= 8 else 0
    return (
        struct.pack("<HHIIHH", tag, channels, rate, rate * block, block, bits)
        + extra
    )


def test_rejects_truncated_fmt_chunk():
    # fmt chunk shorter than the 16 bytes the fields occupy: fixed-offset
    # reads would overread the heap without the size check.
    assert not _open_mem(_wav_bytes(_fmt()[:10]))


def test_rejects_zero_channels_and_zero_bits():
    # channels=0 / bits=0 reach bytes_per_frame() -> division by zero (SIGFPE)
    # without validation.
    assert not _open_mem(_wav_bytes(_fmt(channels=0)))
    assert not _open_mem(_wav_bytes(_fmt(bits=0)))


def test_rejects_float_with_narrow_bits():
    # format 3 (IEEE float) with bits<32 made cvt_sample memcpy 8 bytes at a
    # 2-3 byte stride -> out-of-bounds heap read.
    for bits in (8, 16, 24):
        assert not _open_mem(_wav_bytes(_fmt(tag=3, bits=bits)))
    # while genuine float32 still opens:
    assert _open_mem(_wav_bytes(_fmt(tag=3, bits=32)))


def test_rejects_extensible_without_subformat():
    # WAVE_FORMAT_EXTENSIBLE requires 40 bytes (subformat at offset 24).
    assert not _open_mem(_wav_bytes(_fmt(tag=0xFFFE)))


def test_rejects_giant_header_chunk():
    import struct

    # fmt size field claims 256 MB: must be rejected, not allocated.
    payload = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 1 << 28) + _fmt()
    )
    assert not _open_mem(payload)


def test_lying_data_size_clamps_to_eof():
    import ctypes
    import struct

    from graphaudio_tpu.io import native

    lib = native.load()
    if lib is None:
        pytest.skip("no native codec on this machine")
    # data chunk claims 1 GB but only 64 bytes follow -> 16 frames, not 256M.
    payload = _wav_bytes(_fmt())[: -4 - 64] + struct.pack("<I", 1 << 30) + b"\x00" * 64
    h = lib.gac_open_memory(payload, len(payload))
    assert h
    try:
        assert lib.gac_frames(h) == 64 // 4
    finally:
        lib.gac_close(h)


def test_rejects_malformed_aiff_comm():
    import struct

    def aiff(comm_payload: bytes) -> bytes:
        chunks = b"COMM" + struct.pack(">I", len(comm_payload)) + comm_payload
        if len(comm_payload) % 2:
            chunks += b"\x00"
        chunks += b"SSND" + struct.pack(">I", 8 + 64) + b"\x00" * (8 + 64)
        return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks

    def comm(channels=1, frames=16, bits=16, exp=0x400E, mant=0xBB80 << 48):
        # 80-bit extended sample rate: default encodes 48000.
        return struct.pack(">HIH", channels, frames, bits) + struct.pack(
            ">HQ", exp, mant
        )

    assert _open_mem(aiff(comm()))  # sane file opens
    assert not _open_mem(aiff(comm()[:12]))  # truncated COMM
    assert not _open_mem(aiff(comm(channels=0)))
    assert not _open_mem(aiff(comm(bits=0)))
    # NaN/inf sample rate (exponent all-ones) must not reach the int cast.
    assert not _open_mem(aiff(comm(exp=0x7FFF)))


# -- additional containers (libsndfile-breadth parity) -------------------------

def _pcm16(sig):
    return np.clip(np.rint(sig * 32768.0), -32768, 32767).astype(np.int16)


def test_au_decode_be16_and_ulaw():
    import struct

    sig = (np.sin(2 * np.pi * 440 * np.arange(1000) / SR) * 0.5).astype(np.float32)
    pcm = _pcm16(sig)
    # encoding 3 = 16-bit BE PCM, mono
    au = struct.pack(">4sIIIII", b".snd", 28, len(pcm) * 2, 3, SR, 1)
    au += b"\x00" * 4 + pcm.astype(">i2").tobytes()
    with AudioDecoder(au) as dec:
        assert dec.sample_rate == SR and dec.channels == 1
        assert dec.frames == 1000
        out = dec.decode(1000)[:, 0]
    assert np.abs(out - pcm.astype(np.float32) / 32768.0).max() == 0

    # mu-law (encoding 1): expansion must invert compression to ~mu-law SNR
    def ulaw_compress(x):
        x = np.clip((x * 32768).astype(np.int32), -32635, 32635)
        sign = np.where(x < 0, 0x80, 0)
        x = np.abs(x) + 0x84
        exp = (np.floor(np.log2(x)) - 7).astype(np.int32)
        mant = (x >> (exp + 3)) & 0x0F
        return (~(sign | (exp << 4) | mant)).astype(np.uint8)

    comp = ulaw_compress(sig)
    au2 = struct.pack(">4sIIIII", b".snd", 24, len(comp), 1, SR, 1)
    au2 += comp.tobytes()
    with AudioDecoder(au2) as dec:
        out = dec.decode(dec.frames)[:, 0]
    assert np.abs(out - sig).max() < 0.02  # G.711 quantization


def test_caf_decode_float_le_and_int_be():
    import struct

    sig = (np.sin(2 * np.pi * 220 * np.arange(800) / SR) * 0.4).astype(np.float32)

    def caf(desc_flags, fmt_bytes, bits, data):
        bpp = 2 * (bits // 8)  # stereo
        desc = struct.pack(">d4sIIIII", float(SR), b"lpcm", desc_flags,
                           bpp, 1, 2, bits)
        out = b"caff" + struct.pack(">HH", 1, 0)
        out += b"desc" + struct.pack(">q", len(desc)) + desc
        out += b"data" + struct.pack(">q", 4 + len(data)) + b"\x00" * 4 + data
        return out

    inter = np.stack([sig, -sig], axis=1).reshape(-1)
    # float32 little-endian (flags: 1=float | 2=little-endian)
    blob = caf(3, None, 32, inter.astype("<f4").tobytes())
    with AudioDecoder(blob) as dec:
        assert dec.channels == 2 and dec.frames == 800
        out = dec.decode(800).T
    assert np.abs(out[0] - sig).max() == 0

    # int16 big-endian (flags 0)
    pcm = _pcm16(inter)
    blob = caf(0, None, 16, pcm.astype(">i2").tobytes())
    with AudioDecoder(blob) as dec:
        out = dec.decode(800).T
    assert np.abs(out[0] - pcm[::2].astype(np.float32) / 32768.0).max() == 0


def test_w64_decode_pcm16():
    import struct

    riff_guid = bytes([0x72, 0x69, 0x66, 0x66, 0x2E, 0x91, 0xCF, 0x11,
                       0xA5, 0xD6, 0x28, 0xDB, 0x04, 0xC1, 0x00, 0x00])
    wave_guid = bytes([0x77, 0x61, 0x76, 0x65, 0xF3, 0xAC, 0xD3, 0x11,
                       0x8C, 0xD1, 0x00, 0xC0, 0x4F, 0x8E, 0xDB, 0x8A])
    fmt_guid = b"fmt " + bytes([0xF3, 0xAC, 0xD3, 0x11, 0x8C, 0xD1,
                                0x00, 0xC0, 0x4F, 0x8E, 0xDB, 0x8A])
    data_guid = b"data" + bytes([0xF3, 0xAC, 0xD3, 0x11, 0x8C, 0xD1,
                                 0x00, 0xC0, 0x4F, 0x8E, 0xDB, 0x8A])
    sig = (np.sin(2 * np.pi * 100 * np.arange(600) / SR) * 0.3).astype(np.float32)
    pcm = _pcm16(sig).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, SR, SR * 2, 2, 16)
    body = fmt_guid + struct.pack("<q", 24 + len(fmt)) + fmt
    body += b"\x00" * ((8 - (24 + len(fmt)) % 8) % 8)
    body += data_guid + struct.pack("<q", 24 + len(pcm)) + pcm
    blob = riff_guid + struct.pack("<q", 40 + len(body)) + wave_guid + body
    with AudioDecoder(blob) as dec:
        assert dec.channels == 1 and dec.frames == 600
        out = dec.decode(600)[:, 0]
    assert np.abs(out - _pcm16(sig).astype(np.float32) / 32768.0).max() == 0


def test_rf64_decode_with_ds64_size():
    import struct

    sig = (np.sin(2 * np.pi * 55 * np.arange(500) / SR) * 0.3).astype(np.float32)
    pcm = _pcm16(sig).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, SR, SR * 2, 2, 16)
    ds64 = struct.pack("<QQQI", 0, len(pcm), 500, 0)  # riff, data, samples
    blob = b"RF64" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
    blob += b"ds64" + struct.pack("<I", len(ds64)) + ds64
    blob += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    blob += b"data" + struct.pack("<I", 0xFFFFFFFF) + pcm
    with AudioDecoder(blob) as dec:
        assert dec.frames == 500
        out = dec.decode(500)[:, 0]
    assert np.abs(out - _pcm16(sig).astype(np.float32) / 32768.0).max() == 0


def test_aifc_sowt_little_endian():
    import struct

    sig = (np.sin(2 * np.pi * 330 * np.arange(400) / SR) * 0.5).astype(np.float32)
    pcm = _pcm16(sig)

    def ext80(rate):
        # 80-bit extended for integer rates
        e = int(rate).bit_length() - 1
        return struct.pack(">HQ", 16383 + e, int(rate) << (63 - e))

    comm = struct.pack(">HIH", 1, 400, 16) + ext80(SR) + b"sowt" + b"\x00\x00"
    ssnd = struct.pack(">II", 0, 0) + pcm.astype("<i2").tobytes()
    body = b"COMM" + struct.pack(">I", len(comm)) + comm
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    blob = b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFC" + body
    with AudioDecoder(blob) as dec:
        assert dec.frames == 400
        out = dec.decode(400)[:, 0]
    assert np.abs(out - pcm.astype(np.float32) / 32768.0).max() == 0


def test_malformed_inputs_never_crash(rng):
    """Every container parser must reject (not crash on) hostile bytes:
    random noise, truncations of valid files, and magic-only stubs."""
    import struct

    valid = []
    # a valid specimen of each natively parsed container
    sig = (rng.standard_normal(256) * 0.3).astype(np.float32)
    pcm = np.clip(np.rint(sig * 32768), -32768, 32767).astype(np.int16)
    valid.append(struct.pack(">4sIIIII", b".snd", 24, 512, 3, SR, 1)
                 + pcm.astype(">i2").tobytes())
    from graphaudio_tpu.io import write_flac
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        fp = os.path.join(td, "f.flac")
        write_flac(fp, sig[None], SR)
        valid.append(open(fp, "rb").read())
        from graphaudio_tpu.io import write_wav
        wp = os.path.join(td, "w.wav")
        write_wav(wp, sig[None], SR)
        valid.append(open(wp, "rb").read())

    r = np.random.default_rng(99)
    cases = []
    for blob in valid:
        for cut in (4, 9, 17, len(blob) // 2, len(blob) - 1):
            cases.append(blob[:cut])
        # bit-flipped copies
        for _ in range(8):
            b = bytearray(blob)
            for _ in range(6):
                b[int(r.integers(0, len(b)))] ^= int(r.integers(1, 255))
            cases.append(bytes(b))
    for magic in (b".snd", b"caff", b"fLaC", b"RF64", b"RIFF", b"FORM",
                  bytes([0x72, 0x69, 0x66, 0x66])):
        cases.append(magic)
        cases.append(magic + bytes(r.integers(0, 256, 64, dtype=np.uint8)))
    for n in (0, 1, 16, 1024):
        cases.append(bytes(r.integers(0, 256, n, dtype=np.uint8)))

    for i, blob in enumerate(cases):
        try:
            with AudioDecoder(blob) as dec:
                dec.decode(min(dec.frames, 4096) if dec.frames > 0 else 128)
                dec.try_seek(0.01)
                dec.decode(64)
        except Exception:
            pass  # rejecting is fine; crashing the process is not


def test_alaw_polarity_and_caf_eof_size():
    """Review follow-ups: A-law sign convention (set sign bit = POSITIVE
    after the 0x55 toggle) and CAF's data-size -1 = until-EOF marker."""
    import struct

    # A-law byte 0xD5 decodes to +8 in the Sun reference alaw2linear table.
    au = struct.pack(">4sIIIII", b".snd", 24, 2, 27, SR, 1) + bytes([0xD5, 0x55])
    with AudioDecoder(au) as dec:
        out = dec.decode(2)[:, 0]
    assert out[0] > 0 and abs(out[0] - 8 / 32768.0) < 1e-6
    assert out[1] < 0  # 0x55 -> -8

    # CAF with mChunkSize = -1 on the data chunk (Core Audio streamed file)
    sig = (np.sin(2 * np.pi * 110 * np.arange(300) / SR) * 0.4).astype(np.float32)
    pcm = _pcm16(sig)
    desc = struct.pack(">d4sIIIII", float(SR), b"lpcm", 0, 2, 1, 1, 16)
    blob = b"caff" + struct.pack(">HH", 1, 0)
    blob += b"desc" + struct.pack(">q", len(desc)) + desc
    blob += b"data" + struct.pack(">q", -1) + b"\x00" * 4 + pcm.astype(">i2").tobytes()
    with AudioDecoder(blob) as dec:
        assert dec.frames == 300
        out = dec.decode(300)[:, 0]
    assert np.abs(out - pcm.astype(np.float32) / 32768.0).max() == 0


def test_flac_hostile_partition_order_rejected():
    """A FLAC frame whose partition size is smaller than the predictor
    order must be rejected, not underflow the residual count (heap
    overflow before the fix)."""
    import struct

    # Minimal fLaC container: STREAMINFO for 4096-block mono 16-bit...
    si = bytearray(34)
    si[0:2] = (4096).to_bytes(2, "big")
    si[2:4] = (4096).to_bytes(2, "big")
    si[10] = 48000 >> 12
    si[11] = (48000 >> 4) & 0xFF
    si[12] = ((48000 & 0xF) << 4) | (0 << 1) | 0  # mono, bps hi bit
    si[13] = (15 << 4) | 0  # bps-1 = 15 -> 16 bit
    si[14:18] = (8192).to_bytes(4, "big")
    blob = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)
    # Frame: sync, blocksize code 12 (4096), sr from streaminfo, mono,
    # 16-bit, frame 0, crc8=anything; subframe FIXED order 4; residual
    # method 0, partition order 11 -> 2 samples/partition < order 4.
    bits = ""
    bits += "11111111111110"  # sync
    bits += "0"  # reserved
    bits += "0"  # fixed blocking
    bits += "1100"  # blocksize 4096
    bits += "0000"  # sr from streaminfo
    bits += "0000"  # mono
    bits += "100"   # 16-bit
    bits += "0"
    bits += "00000000"  # utf8 frame 0
    bits += "00000000"  # crc8 (unchecked)
    bits += "0"         # subframe pad
    bits += "001100"    # FIXED order 4
    bits += "0"         # no wasted bits
    bits += "0" * (16 * 4)  # 4 warmup samples
    bits += "00"        # rice method 0
    bits += "1011"      # partition order 11
    bits += "0000"      # rice param 0
    bits += "1" * 4096  # plenty of unary bits if it (wrongly) proceeds
    pad = (-len(bits)) % 8
    bits += "0" * pad
    frame = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    data = blob + frame
    try:
        with AudioDecoder(data) as dec:
            out = dec.decode(min(dec.frames or 4096, 4096))
            assert np.isfinite(out).all()
    except Exception:
        pass  # rejecting the file entirely is also fine


def test_tiny_buffer_extreme_downsample_renders():
    """A 1-sample buffer at an extreme rate ratio produced a sub-128
    arena that crashed the group window fetch (regression)."""
    import jax

    ctx = ga.OfflineAudioContext(sample_rate=48000, superblock=8)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(
        np.ones(1, np.float32), 1500
    )
    src.playback_rate.value = 1.0
    src.connect(ctx.destination)
    src.start(0)
    out = np.asarray(ctx.render(1024))
    assert np.isfinite(out).all()


# ---- ADPCM (IMA + MS) --------------------------------------------------------
#
# The tests carry their own spec-literal Python encoders AND decoders: the
# native decoder must match the Python decoder bit-exactly (both implement
# the published tables), and both must track the original signal to within
# ADPCM quantization error.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
_MS_C1, _MS_C2 = 256, 0  # coefficient set 0


def _ima_step(pred, idx, nib):
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
    return pred, idx


def _ima_encode_nibble(s, pred, idx):
    step = _IMA_STEPS[idx]
    diff = s - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    return nib


def _wav_adpcm(tag, channels, sr, block_align, spb, n_frames, data_bytes):
    import struct
    fmt = struct.pack("<HHIIHHH", tag, channels, sr,
                      sr * block_align // spb, block_align, 4, spb)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"fact" + struct.pack("<II", 4, n_frames)
              + b"data" + struct.pack("<I", len(data_bytes)) + data_bytes)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _ima_encode(pcm):  # pcm: int16[ch, n] -> (blocks bytes, spb, block_align)
    ch, n = pcm.shape
    words_per_ch = 8  # payload: 8 x 4-byte words per channel
    spb = words_per_ch * 8 + 1
    block_align = 4 * ch + 4 * words_per_ch * ch
    out = bytearray()
    pred = [0] * ch
    idx = [0] * ch
    pos = 0
    while pos < n:
        for c in range(ch):
            pred[c] = int(pcm[c, pos]) if pos < n else 0
            out += int(pred[c]).to_bytes(2, "little", signed=True)
            out += bytes([idx[c], 0])
        s = pos + 1
        for w in range(words_per_ch):
            for c in range(ch):
                word = 0
                for k in range(8):
                    j = s + w * 8 + k
                    target = int(pcm[c, j]) if j < n else 0
                    nib = _ima_encode_nibble(target, pred[c], idx[c])
                    pred[c], idx[c] = _ima_step(pred[c], idx[c], nib)
                    word |= nib << (4 * k)
                out += word.to_bytes(4, "little")
        pos += spb
    return bytes(out), spb, block_align


def _ima_decode_py(blocks, ch, spb, block_align, n_frames):
    out = np.zeros((ch, n_frames), np.float64)
    nb = len(blocks) // block_align
    f = 0
    for b in range(nb):
        blk = blocks[b * block_align:(b + 1) * block_align]
        pred = [0] * ch
        idx = [0] * ch
        for c in range(ch):
            h = blk[4 * c:4 * c + 4]
            pred[c] = int.from_bytes(h[:2], "little", signed=True)
            idx[c] = min(h[2], 88)
            if f < n_frames:
                out[c, f] = pred[c] / 32768.0
        s = 1
        pos = 4 * ch
        while s < spb and pos + 4 * ch <= block_align:
            for c in range(ch):
                word = blk[pos + 4 * c: pos + 4 * c + 4]
                for k in range(8):
                    nib = (word[k // 2] >> (4 * (k % 2))) & 0xF
                    pred[c], idx[c] = _ima_step(pred[c], idx[c], nib)
                    if f + s + k < n_frames and s + k < spb:
                        out[c, f + s + k] = pred[c] / 32768.0
            pos += 4 * ch
            s += 8
        f += spb
    return out[:, :n_frames]


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_adpcm_decode(tmp_path, rng, channels):
    from graphaudio_tpu.io import codec_capabilities
    if not codec_capabilities().get("adpcm"):
        pytest.skip("native codec unavailable")
    n = 700
    t = np.arange(n) / SR
    sig = np.stack([
        np.sin(2 * np.pi * (220.0 * (c + 1)) * t) * 0.5 for c in range(channels)
    ])
    pcm = np.clip(np.rint(sig * 32767), -32768, 32767).astype(np.int16)
    blocks, spb, ba = _ima_encode(pcm)
    wav = _wav_adpcm(0x11, channels, SR, ba, spb, n, blocks)
    path = tmp_path / "ima.wav"
    path.write_bytes(wav)
    with AudioDecoder(str(path)) as dec:
        assert dec.channels == channels
        assert dec.sample_rate == SR
        got = dec.decode_planar(n + 64)
    assert got.shape == (channels, n)  # fact chunk trims the padded block
    want = _ima_decode_py(blocks, channels, spb, ba, n)
    np.testing.assert_array_equal(got.astype(np.float64), want.astype(np.float32))
    # tracks the original signal to ADPCM quantization accuracy once the
    # step size has adapted (the cold-start attack is part of the format)
    assert np.max(np.abs(got[:, 100:] - sig[:, 100:n])) < 0.03


def test_ms_adpcm_decode(tmp_path, rng):
    from graphaudio_tpu.io import codec_capabilities
    if not codec_capabilities().get("adpcm"):
        pytest.skip("native codec unavailable")
    ch, n = 2, 600
    t = np.arange(n) / SR
    sig = np.stack([np.sin(2 * np.pi * 330 * t) * 0.4,
                    np.sin(2 * np.pi * 550 * t) * 0.4])
    pcm = np.clip(np.rint(sig * 32767), -32768, 32767).astype(np.int16)

    spb = 128
    ba = 7 * ch + (spb - 2) * ch // 2
    out = bytearray()
    pos = 0
    state = None
    py = np.zeros((ch, n))
    f = 0
    while pos < n:
        def S(c, j):
            return int(pcm[c, pos + j]) if pos + j < n else 0
        delta = [64] * ch
        s1 = [S(c, 1) for c in range(ch)]
        s2 = [S(c, 0) for c in range(ch)]
        out += bytes([0] * ch)  # coefficient set 0 per channel
        for c in range(ch):
            out += int(delta[c]).to_bytes(2, "little", signed=True)
        for c in range(ch):
            out += int(s1[c]).to_bytes(2, "little", signed=True)
        for c in range(ch):
            out += int(s2[c]).to_bytes(2, "little", signed=True)
        for c in range(ch):
            if f < n:
                py[c, f] = s2[c] / 32768.0
            if f + 1 < n:
                py[c, f + 1] = s1[c] / 32768.0
        nibs = []
        for j in range(2, spb):
            for c in range(ch):
                predictor = (s1[c] * _MS_C1 + s2[c] * _MS_C2) >> 8
                target = S(c, j)
                err = target - predictor
                nib = max(-8, min(7, int(round(err / delta[c]))))
                nibs.append(nib & 0xF)
                newv = max(-32768, min(32767, predictor + nib * delta[c]))
                if pos + j < n:
                    py[c, pos + j] = newv / 32768.0
                s2[c] = s1[c]
                s1[c] = newv
                delta[c] = max(16, (_MS_ADAPT[nib & 0xF] * delta[c]) >> 8)
        for i in range(0, len(nibs), 2):
            out += bytes([(nibs[i] << 4) | nibs[i + 1]])
        pos += spb
        f += spb
    del state
    wav = _wav_adpcm(0x02, ch, SR, ba, spb, n, bytes(out))
    path = tmp_path / "ms.wav"
    path.write_bytes(wav)
    with AudioDecoder(str(path)) as dec:
        got = dec.decode_planar(n + 200)
    assert got.shape == (ch, n)
    np.testing.assert_array_equal(got.astype(np.float64), py.astype(np.float32))
    assert np.max(np.abs(got - sig[:, :n])) < 0.05


def test_adpcm_seek_block_exact(tmp_path, rng):
    from graphaudio_tpu.io import codec_capabilities
    if not codec_capabilities().get("adpcm"):
        pytest.skip("native codec unavailable")
    n = 1300
    sig = (rng.standard_normal(n) * 0.3).astype(np.float64)
    pcm = np.clip(np.rint(sig * 32767), -32768, 32767).astype(np.int16)[None]
    blocks, spb, ba = _ima_encode(pcm)
    wav = _wav_adpcm(0x11, 1, SR, ba, spb, n, blocks)
    path = tmp_path / "seek.wav"
    path.write_bytes(wav)
    with AudioDecoder(str(path)) as dec:
        whole = dec.decode_planar(n)
        assert dec.try_seek(500 / SR)
        rest = dec.decode_planar(n)
    np.testing.assert_array_equal(rest, whole[:, 500:])


def test_adpcm_malformed_headers_never_crash(rng):
    """Hostile block_align / samples-per-block combinations must be
    rejected or decoded within bounds, never crash."""
    from graphaudio_tpu.io import native
    import struct
    lib = native.load()
    if lib is None:
        pytest.skip("native codec unavailable")
    base = _wav_adpcm(0x11, 1, SR, 36, 65, 130, b"\x00" * 72)
    for _ in range(200):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        payload = bytes(buf)  # must outlive the handle (memory-backed open)
        h = lib.gac_open_memory(payload, len(payload))
        if h:
            out = np.zeros(4096, np.float32)
            import ctypes as c
            lib.gac_read_f32(h, out.ctypes.data_as(c.POINTER(c.c_float)), 1024)
            lib.gac_close(h)
        del payload
    # degenerate geometry: block_align smaller than its header
    bad = _wav_adpcm(0x11, 2, SR, 8, 65, 100, b"\x00" * 64)
    assert lib.gac_open_memory(bad, len(bad)) is None
    bad2 = _wav_adpcm(0x02, 1, SR, 6, 4, 100, b"\x00" * 64)
    assert lib.gac_open_memory(bad2, len(bad2)) is None


# ---- Ogg Opus ----------------------------------------------------------------


def test_opus_roundtrip(tmp_path):
    from graphaudio_tpu.io import codec_capabilities, write_opus
    caps = codec_capabilities()
    if not (caps.get("opus") and caps.get("opus_encode")):
        pytest.skip("system opus codec unavailable")
    n = SR  # 1 s stereo at 48 kHz
    t = np.arange(n) / SR
    sig = np.stack([np.sin(2 * np.pi * 440 * t) * 0.5,
                    np.sin(2 * np.pi * 660 * t) * 0.5]).astype(np.float32)
    path = tmp_path / "t.opus"
    write_opus(path, sig, SR)
    with AudioDecoder(str(path)) as dec:
        assert dec.channels == 2
        assert dec.sample_rate == 48000
        assert dec.frames == n  # preskip + end trim applied
        got = dec.decode_planar(n)
    assert got.shape == (2, n)
    # lossy codec: verify alignment + fidelity by normalized correlation
    mid = slice(1000, n - 1000)
    for c in range(2):
        a, b = sig[c, mid], got[c, mid].astype(np.float64)
        corr = np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b))
        assert corr > 0.99, corr


def test_opus_24k_input_decodes_at_48k(tmp_path):
    from graphaudio_tpu.io import codec_capabilities, write_opus
    caps = codec_capabilities()
    if not (caps.get("opus") and caps.get("opus_encode")):
        pytest.skip("system opus codec unavailable")
    n = 24000 // 2
    t = np.arange(n) / 24000.0
    sig = (np.sin(2 * np.pi * 220 * t) * 0.4).astype(np.float32)[None]
    path = tmp_path / "t24.opus"
    write_opus(path, sig, 24000)
    with AudioDecoder(str(path)) as dec:
        assert dec.sample_rate == 48000
        assert dec.frames == 2 * n
        got = dec.decode_planar(2 * n)
    assert got.shape == (1, 2 * n)
    spec = np.abs(np.fft.rfft(got[0]))
    assert abs(spec.argmax() * 48000 / got.shape[1] - 220.0) < 3.0


def test_opus_seek_deterministic(tmp_path):
    from graphaudio_tpu.io import codec_capabilities, write_opus
    caps = codec_capabilities()
    if not (caps.get("opus") and caps.get("opus_encode")):
        pytest.skip("system opus codec unavailable")
    n = SR // 2
    rng = np.random.default_rng(7)
    sig = (rng.standard_normal(n) * 0.2).astype(np.float32)[None]
    path = tmp_path / "s.opus"
    write_opus(path, sig, SR)
    with AudioDecoder(str(path)) as dec:
        whole = dec.decode_planar(n)
        assert dec.try_seek(10000 / 48000.0)
        rest = dec.decode_planar(n)
    np.testing.assert_array_equal(rest, whole[:, 10000:])


def test_opus_stream_node_with_loop(tmp_path):
    """Ogg Opus feeds the streaming node end-to-end, including the gapless
    rewind-and-refill loop path (exercises opus decode-from-start seek)."""
    from graphaudio_tpu.io import codec_capabilities, write_opus
    caps = codec_capabilities()
    if not (caps.get("opus") and caps.get("opus_encode")):
        pytest.skip("system opus codec unavailable")
    n = 24000  # 0.5 s
    t = np.arange(n) / SR
    sig = (np.sin(2 * np.pi * 440 * t) * 0.5).astype(np.float32)[None]
    path = tmp_path / "s.opus"
    write_opus(path, sig, SR)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    node = AudioDecoderStreamNode.from_file(ctx, str(path))
    node.loop = True
    node.connect(ctx.destination)
    node.play()
    out = ctx.render(2 * n)  # spans the loop seam at 0.5 s
    spec = np.abs(np.fft.rfft(out[0].astype(np.float64)))
    peak_hz = spec.argmax() * SR / out.shape[1]
    assert abs(peak_hz - 440.0) < 10.0
    # audio keeps flowing after the seam
    assert float(np.sqrt(np.mean(out[0, n:].astype(np.float64) ** 2))) > 0.2


# ---- ALAC (Apple Lossless in CAF) -------------------------------------------


def test_alac_roundtrip(tmp_path):
    from graphaudio_tpu.io import codec_capabilities, write_alac
    caps = codec_capabilities()
    if not (caps.get("alac") and caps.get("alac_encode")):
        pytest.skip("native codec unavailable")
    _codec_roundtrip(tmp_path / "t.caf", lambda p, d, sr: write_alac(p, d, sr), True)


def test_alac_lossless_matches_flac(tmp_path):
    """ALAC is lossless: for identical float input at the same bit depth,
    the ALAC and FLAC decodes are bit-identical (same quantizer, both
    lossless), across packet-boundary / partial-final-packet lengths and
    channel element layouts (SCE / CPE / mixed)."""
    from graphaudio_tpu.io import codec_capabilities, write_alac, write_flac
    caps = codec_capabilities()
    if not (caps.get("alac") and caps.get("alac_encode")
            and caps.get("flac") and caps.get("flac_encode")):
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(11)
    for n, ch in [(57, 1), (4095, 2), (4096, 2), (12345, 3)]:
        sig = np.clip(rng.standard_normal((ch, n)) * 0.4, -1, 1).astype(np.float32)
        pa, pf = tmp_path / f"{n}_{ch}.caf", tmp_path / f"{n}_{ch}.flac"
        write_alac(pa, sig, SR, bits=16)
        write_flac(pf, sig, SR, bits=16)
        with AudioDecoder(str(pa)) as da, AudioDecoder(str(pf)) as df:
            assert da.frames == n and da.channels == ch
            assert da.sample_rate == SR
            a = da.decode_planar(n)
            f = df.decode_planar(n)
        assert np.array_equal(a, f), f"n={n} ch={ch} not lossless"


def test_alac_24bit_lossless(tmp_path):
    from graphaudio_tpu.io import codec_capabilities, write_alac
    caps = codec_capabilities()
    if not (caps.get("alac") and caps.get("alac_encode")):
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(12)
    sig = np.clip(rng.standard_normal((2, 9001)) * 0.4, -1, 1).astype(np.float32)
    path = tmp_path / "t24.caf"
    write_alac(path, sig, SR, bits=24)
    q = np.clip(np.rint(sig.astype(np.float64) * (1 << 23)),
                -(1 << 23), (1 << 23) - 1)
    expect = (q / (1 << 23)).astype(np.float32)
    with AudioDecoder(str(path)) as dec:
        out = dec.decode_planar(9001)
    assert np.array_equal(out, expect)


def test_alac_entropy_regimes(tmp_path):
    """Each encoder entropy path round-trips: adaptive rice (smooth),
    zero-run coding with the one-shot sign modifier (sparse impulses),
    rice escape (mid-amplitude noise), and the verbatim fallback
    (alternating full-scale)."""
    from graphaudio_tpu.io import codec_capabilities, write_alac
    caps = codec_capabilities()
    if not (caps.get("alac") and caps.get("alac_encode")):
        pytest.skip("native codec unavailable")
    n = 8192
    t = np.arange(n)
    rng = np.random.default_rng(13)
    sparse = np.zeros(n, np.float32)
    sparse[::97] = 0.5
    sparse[50::131] = -0.25
    alt = np.where(t % 2 == 0, 0.999, -0.999).astype(np.float32)
    cases = {
        "smooth": (0.3 * np.sin(2 * np.pi * 440 * t / SR)).astype(np.float32),
        "sparse": sparse,
        "noise": np.clip(rng.standard_normal(n) * 0.3, -1, 1).astype(np.float32),
        "verbatim": alt,
        "silence": np.zeros(n, np.float32),
    }
    for name, sig in cases.items():
        path = tmp_path / f"{name}.caf"
        write_alac(path, sig[None], SR, bits=16)
        q = np.clip(np.rint(sig.astype(np.float64) * 32768), -32768, 32767)
        expect = (q / 32768.0).astype(np.float32)
        with AudioDecoder(str(path)) as dec:
            out = dec.decode_planar(n)
        assert np.array_equal(out[0], expect), f"{name} not lossless"


def test_alac_seek(tmp_path):
    """pakt-table seek lands on the packet boundary and decodes forward."""
    from graphaudio_tpu.io import codec_capabilities, write_alac
    caps = codec_capabilities()
    if not (caps.get("alac") and caps.get("alac_encode")):
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(14)
    n = 13000
    sig = np.clip(rng.standard_normal((1, n)) * 0.2, -1, 1).astype(np.float32)
    path = tmp_path / "seek.caf"
    write_alac(path, sig, SR)
    with AudioDecoder(str(path)) as dec:
        whole = dec.decode_planar(n)
        assert dec.try_seek(5000 / SR)
        rest = dec.decode_planar(n)
    np.testing.assert_array_equal(rest, whole[:, 5000:])


def _avoracle_or_skip():
    from graphaudio_tpu.testing import avoracle
    if avoracle.load() is None:
        pytest.skip("ffmpeg dev libraries unavailable")
    return avoracle


def test_alac_ffmpeg_decodes_ours(tmp_path):
    """Interop, encode direction: a second, independent implementation
    (libavcodec) decodes our ALAC-in-CAF bitstreams bit-exactly across
    element layouts (SCE / CPE / Apple multichannel tables, 1-8 ch) and a
    partial final packet."""
    from graphaudio_tpu.io import codec_capabilities, write_alac
    caps = codec_capabilities()
    if not (caps.get("alac") and caps.get("alac_encode")):
        pytest.skip("native codec unavailable")
    avoracle = _avoracle_or_skip()
    rng = np.random.default_rng(21)
    for n, ch in [(4096, 1), (10111, 2), (5000, 6), (4099, 8)]:
        sig = np.clip(rng.standard_normal((ch, n)) * 0.4, -1, 1).astype(np.float32)
        path = tmp_path / f"ours_{n}_{ch}.caf"
        write_alac(path, sig, SR, bits=16)
        out, rate = avoracle.decode(path)
        assert rate == SR and out.shape == (n, ch)
        q = np.clip(np.rint(sig.astype(np.float64) * 32768), -32768, 32767)
        expect = (q / 32768.0).astype(np.float32).T  # [n, ch] interleaved
        assert np.array_equal(out, expect), f"n={n} ch={ch} interop mismatch"


def test_alac_ours_decodes_ffmpeg(tmp_path):
    """Interop, decode direction: bitstreams produced by libavcodec's own
    ALAC encoder (LPC orders + mid/side via its rate control, not our
    first-order path) decode bit-exactly in our native decoder."""
    from graphaudio_tpu.io import codec_capabilities
    caps = codec_capabilities()
    if not caps.get("alac"):
        pytest.skip("native codec unavailable")
    avoracle = _avoracle_or_skip()
    rng = np.random.default_rng(22)
    for n, ch in [(9001, 1), (12345, 2), (6000, 6)]:
        t = np.arange(n)
        tone = 0.3 * np.sin(2 * np.pi * 330 * t / SR)
        sig = np.clip(tone[None] + rng.standard_normal((ch, n)) * 0.05, -1, 1)
        q = np.clip(np.rint(sig * 32768), -32768, 32767).astype(np.int16)
        path = tmp_path / f"ffm_{n}_{ch}.caf"
        avoracle.encode_alac(path, q.T, SR)
        with AudioDecoder(str(path)) as dec:
            assert dec.channels == ch and dec.sample_rate == SR
            assert dec.frames == n
            out = dec.decode_planar(n)
        expect = (q.astype(np.float64) / 32768.0).astype(np.float32)
        assert np.array_equal(out, expect), f"n={n} ch={ch} interop mismatch"


def test_write_wav_python_fallback_honors_float32(tmp_path, rng):
    """The no-compiler fallback must write a real IEEE-float WAV when
    float32=True (regression: it silently quantized to 16-bit, so output
    differed by machine)."""
    import graphaudio_tpu.io.decode as D
    import graphaudio_tpu.io.native as native

    x = (rng.standard_normal((2, 777)) * 0.3).astype(np.float32)
    real = native.load
    native.load = lambda: None
    try:
        D.write_wav(tmp_path / "f.wav", x, 48000, float32=True)
    finally:
        native.load = real
    got = D.AudioDecoder(str(tmp_path / "f.wav")).decode_planar(10**6)
    np.testing.assert_array_equal(got, x)


def test_stream_playback_rate_automation_followed_at_call_boundaries(tmp_path, rng):
    """Scheduled playbackRate automation on a stream node takes effect at
    render-call boundaries (the reference reads the k-rate curve per block,
    AudioStreamSourceNodeBase.cs:211; regression: events were ignored
    outright — only the base value was ever staged)."""
    import graphaudio_tpu.io.decode as D
    from graphaudio_tpu.io import AudioDecoderStreamNode

    data = (rng.standard_normal((1, 48000)) * 0.3).astype(np.float32)
    path = tmp_path / "s.wav"
    D.write_wav(path, data, 48000, float32=True)

    ctx = ga.OfflineAudioContext(sample_rate=48000, superblock=2)
    node = AudioDecoderStreamNode.from_file(ctx, str(path))
    node.connect(ctx.destination)
    node.play()
    # double speed from t=0: the first render call must stage rate 2.0
    node.playback_rate.set_value_at_time(2.0, 0.0)
    out = ctx.render(1024)
    # rate 2.0 consumes source samples two per output sample: compare
    # against the decoded signal at even indices (cubic interp on integer
    # positions is exact at the sample points)
    want = data[0, 1:1 + 2 * 1024:2]
    got = out[0]
    err = np.abs(got[8:] - want[8:len(got)]).max()
    assert err < 1e-3, err


def test_wav_g711_mulaw_alaw_decode():
    """G.711 mu-law/A-law WAV files (fmt tags 7/6 — the standard telephony
    container) must decode like their AU/Wave64 equivalents (regression:
    parse_wav rejected the tags its own cvt_sample supports)."""
    import struct

    def wav_g711(tag, payload):
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        return (b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(payload)) +
                b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt +
                b"data" + struct.pack("<I", len(payload)) + payload)

    # mu-law 0xFF decodes to 0, 0x00 to the negative extreme (Sun tables).
    with AudioDecoder(wav_g711(7, bytes([0xFF, 0x00]))) as dec:
        assert dec.sample_rate == 8000 and dec.frames == 2
        out = dec.decode(2)[:, 0]
    assert out[0] == 0.0 and out[1] < -0.2

    with AudioDecoder(wav_g711(6, bytes([0xD5, 0x55]))) as dec:
        out = dec.decode(2)[:, 0]
    assert abs(out[0] - 8 / 32768.0) < 1e-6 and out[1] < 0


def test_decode_short_bitexact_pcm16_roundtrip(tmp_path, rng):
    """decode_short (sf_readf_short parity, Libsndfile.cs:26-68) returns
    the STORED int16 samples bit-exactly for integer-PCM sources."""
    import wave

    pcm = (rng.integers(-32768, 32768, size=(1000, 2))).astype(np.int16)
    p = tmp_path / "s.wav"
    with wave.open(str(p), "wb") as w:  # exact stored samples
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(pcm.tobytes())
    with AudioDecoder(str(p)) as d:
        got = d.decode_short(1000)
        assert got.dtype == np.int16 and got.shape == (1000, 2)
        np.testing.assert_array_equal(got, pcm)
    with AudioDecoder(str(p)) as d:
        planar = d.decode_planar_short(1000)
        np.testing.assert_array_equal(planar, pcm.T)


def test_decode_short_quantizes_float_sources(tmp_path, rng):
    x = (rng.standard_normal((2, 500)) * 0.5).astype(np.float32)
    p = tmp_path / "f.wav"
    write_wav(p, x, 48000, float32=True)
    with AudioDecoder(str(p)) as d:
        got = d.decode_short(500)
    want = np.clip(
        np.round(x.T.astype(np.float64) * 32768.0), -32768, 32767
    ).astype(np.int16)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fmt", ["aiff", "au", "caf"])
def test_container_encoders_roundtrip_via_native_decoder(tmp_path, rng, fmt):
    """write_aiff/write_au/write_caf produce files gacodec decodes back to
    the quantized samples exactly (PCM16 paths) / bit-exactly (CAF f32)."""
    from graphaudio_tpu.io import native, write_aiff, write_au, write_caf
    from graphaudio_tpu.io.decode import _quantize_pcm16, codec_capabilities

    if native.load() is None:
        pytest.skip("native codec not built")
    assert codec_capabilities()[fmt] and codec_capabilities()[f"{fmt}_encode"]
    x = (rng.standard_normal((2, 777)) * 0.4).astype(np.float32)
    p = tmp_path / f"x.{fmt}"
    writer = {"aiff": write_aiff, "au": write_au, "caf": write_caf}[fmt]
    writer(p, x, 44100)
    with AudioDecoder(str(p)) as d:
        assert d.channels == 2 and d.sample_rate == 44100
        assert d.frames == 777
        got = d.decode_planar(777)
    if fmt == "caf":  # default float32: lossless
        np.testing.assert_array_equal(got, x)
    else:
        want = _quantize_pcm16(x).astype(np.float32) / 32768.0
        np.testing.assert_array_equal(got, want)


def test_caf_pcm16_and_au_float_variants(tmp_path, rng):
    from graphaudio_tpu.io import native, write_au, write_caf
    from graphaudio_tpu.io.decode import _quantize_pcm16

    if native.load() is None:
        pytest.skip("native codec not built")
    x = (rng.standard_normal((1, 333)) * 0.3).astype(np.float32)
    p1 = tmp_path / "i.caf"
    write_caf(p1, x, 48000, float32=False)
    with AudioDecoder(str(p1)) as d:
        got = d.decode_planar_short(333)
    np.testing.assert_array_equal(got, _quantize_pcm16(x))
    p2 = tmp_path / "f.au"
    write_au(p2, x, 48000, float32=True)
    with AudioDecoder(str(p2)) as d:
        np.testing.assert_array_equal(d.decode_planar(333), x)
