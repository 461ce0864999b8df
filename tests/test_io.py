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
