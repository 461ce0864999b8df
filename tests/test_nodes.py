"""GainNode, StereoPannerNode, ChannelSplitter/Merger, DelayNode semantics."""

import numpy as np

import graphaudio_tpu as ga

SR = 48000


def _noise_buffer(rng, n=2048, channels=1, scale=0.5):
    data = [rng.standard_normal(n).astype(np.float32) * scale for _ in range(channels)]
    return ga.PlayableAudioBuffer.from_channel_arrays(data, SR), np.stack(data)


def _play(ctx, buf):
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.start(0)
    return src


def test_gain_ramp(rng):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    buf, data = _noise_buffer(rng, 2048)
    src = _play(ctx, buf)
    g = ga.GainNode(ctx)
    g.gain.set_value_at_time(0.0, 0.0)
    g.gain.linear_ramp_to_value_at_time(1.0, 1024.0 / SR)
    src.connect(g).connect(ctx.destination)
    out = ctx.render(1024)[0]
    t = np.arange(1024) / SR
    gains = np.clip(t / (1024.0 / SR), 0, 1).astype(np.float32)
    assert np.max(np.abs(out - data[0][:1024] * gains)) < 1e-6


def test_stereo_panner_mono_law(rng):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    buf, data = _noise_buffer(rng, 512)
    src = _play(ctx, buf)
    pan = ga.StereoPannerNode(ctx)
    pan.pan.value = -0.5
    src.connect(pan).connect(ctx.destination)
    out = ctx.render(256)
    x = (-0.5 + 1.0) * 0.5
    gl, gr = np.cos(x * np.pi / 2), np.sin(x * np.pi / 2)
    assert np.max(np.abs(out[0] - data[0][:256] * np.float32(gl))) < 1e-6
    assert np.max(np.abs(out[1] - data[0][:256] * np.float32(gr))) < 1e-6


def test_stereo_panner_stereo_law(rng):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    buf, data = _noise_buffer(rng, 512, channels=2)
    src = _play(ctx, buf)
    pan = ga.StereoPannerNode(ctx)
    src.connect(pan).connect(ctx.destination)

    # pan < 0 mixes R into L (StereoPannerNode.cs:138-142).
    pan.pan.value = -1.0
    out = ctx.render(256)
    x = 0.0
    gl, gr = np.cos(x * np.pi / 2), np.sin(x * np.pi / 2)  # 1, 0
    assert np.max(np.abs(out[0] - (data[0][:256] + data[1][:256] * gl))) < 1e-6
    assert np.max(np.abs(out[1] - data[1][:256] * gr)) < 1e-6


def test_stereo_panner_center_stereo_passthrough(rng):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    buf, data = _noise_buffer(rng, 512, channels=2)
    src = _play(ctx, buf)
    pan = ga.StereoPannerNode(ctx)  # pan = 0 -> x = 1 for pan<=0: gl=cos(pi/2)=0...
    src.connect(pan).connect(ctx.destination)
    out = ctx.render(256)
    # reference law at pan=0: x=1, gl=cos(pi/2)=0, gr=sin(pi/2)=1
    # L = inL + inR*0 = inL; R = inR*1 = inR  (passthrough)
    assert np.max(np.abs(out[0] - data[0][:256])) < 1e-6
    assert np.max(np.abs(out[1] - data[1][:256])) < 1e-6


def test_splitter_merger_roundtrip(rng):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    buf, data = _noise_buffer(rng, 512, channels=2)
    src = _play(ctx, buf)
    split = ga.ChannelSplitterNode(ctx, 2)
    merge = ga.ChannelMergerNode(ctx, 2)
    src.connect(split)
    # swap channels through the splitter/merger pair
    split.connect(merge, output=0, input=1)
    split.connect(merge, output=1, input=0)
    merge.connect(ctx.destination)
    out = ctx.render(256)
    assert np.max(np.abs(out[0] - data[1][:256])) < 1e-7
    assert np.max(np.abs(out[1] - data[0][:256])) < 1e-7


def test_splitter_extra_outputs_silent(rng):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    buf, data = _noise_buffer(rng, 512, channels=1)
    src = _play(ctx, buf)
    split = ga.ChannelSplitterNode(ctx, 4)
    src.connect(split)
    split.connect(ctx.destination, output=3)  # beyond input channels -> silence
    out = ctx.render(128)
    assert np.allclose(out, 0.0)


def test_delay_constant(rng):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    buf, data = _noise_buffer(rng, 4096)
    src = _play(ctx, buf)
    d = ga.DelayNode(ctx, max_delay_time=0.1)
    delay_samples = 200
    d.delay_time.value = delay_samples / SR
    src.connect(d).connect(ctx.destination)
    out = ctx.render(1024)[0]
    # reference: truncated integer delay, read-before-write
    n_delay = int((delay_samples / SR) * SR)
    expect = np.zeros(1024, np.float32)
    expect[n_delay:] = data[0][: 1024 - n_delay]
    assert np.max(np.abs(out - expect)) < 1e-7


def test_delay_zero_is_silent(rng):
    # delaySamples <= 0 reads 0 (DelayNode.cs:143-144).
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    buf, data = _noise_buffer(rng, 512)
    src = _play(ctx, buf)
    d = ga.DelayNode(ctx)
    d.delay_time.value = 0.0
    src.connect(d).connect(ctx.destination)
    out = ctx.render(256)[0]
    assert np.allclose(out, 0.0)


def test_delay_tail_after_input_stops(rng):
    # The delay line keeps producing its tail after the input goes silent
    # (DelayNode.cs:61-76). Source is 256 samples; its final block is cleared
    # by the reference quirk, so only block 0 enters the delay line.
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    buf, data = _noise_buffer(rng, 256)
    src = _play(ctx, buf)
    d = ga.DelayNode(ctx, max_delay_time=0.05)
    d.delay_time.value = 256 / SR
    src.connect(d).connect(ctx.destination)
    out = ctx.render(640)[0]
    expect = np.zeros(640, np.float32)
    expect[256 : 256 + 128] = data[0][:128]
    assert np.max(np.abs(out - expect)) < 1e-7


def test_delay_automated_time(rng):
    # a-rate delay time, integer-truncated per sample (DelayNode.cs:66-91).
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    buf, data = _noise_buffer(rng, 2048)
    src = _play(ctx, buf)
    d = ga.DelayNode(ctx, max_delay_time=0.05)
    d.delay_time.set_value_at_time(100 / SR, 0.0)
    d.delay_time.set_value_at_time(150 / SR, 512 / SR)
    src.connect(d).connect(ctx.destination)
    out = ctx.render(1024)[0]
    x = data[0]
    expect = np.zeros(1024, np.float32)
    for i in range(1024):
        delay = 100 if i < 512 else 150
        j = i - delay
        if j >= 0:
            expect[i] = x[j]
    assert np.max(np.abs(out - expect)) < 1e-7
