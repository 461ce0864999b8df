"""AudioBufferSourceNode resampling path (playbackRate / sample-rate ratio)."""

import numpy as np

import graphaudio_tpu as ga

SR = 48000


def _mono_ctx(superblock=2):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    ctx.destination.set_channel_count(1)
    ctx.destination.inputs[0].set_channel_count_mode(ga.ChannelCountMode.EXPLICIT)
    return ctx


def _catmull_rom(s0, s1, s2, s3, t):
    return s1 + t * (
        0.5 * (s2 - s0)
        + t * ((s0 - 2.5 * s1 + 2.0 * s2 - 0.5 * s3) + t * (0.5 * (s3 - s0) + 1.5 * (s1 - s2)))
    )


def _golden_resample(data, rate, n_out, start_pos=0.0):
    """Mirror of the reference CubicResampler stream: x_j = start+1 + j*rate."""
    out = np.zeros(n_out, np.float32)
    for j in range(n_out):
        x = start_pos + 1.0 + j * rate
        base = int(np.floor(x))
        t = np.float32(x - base)
        idx = np.clip([base - 1, base, base + 1, base + 2], 0, len(data) - 1)
        out[j] = _catmull_rom(*[data[i] for i in idx], t)
    return out


def test_resample_rate_half(rng):
    data = rng.standard_normal(4096).astype(np.float32)
    ctx = _mono_ctx()
    buf = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.playback_rate.value = 0.5
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(1024)[0]
    expect = _golden_resample(data, 0.5, 1024)
    assert np.max(np.abs(out - expect)) < 1e-5


def test_resample_441_to_48(rng):
    # 44.1kHz buffer in a 48kHz context: effectiveRate = 44100/48000.
    data = rng.standard_normal(8192).astype(np.float32)
    ctx = _mono_ctx()
    buf = ga.PlayableAudioBuffer.from_mono_array(data, 44100)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(2048)[0]
    expect = _golden_resample(data, 44100.0 / 48000.0, 2048)
    assert np.max(np.abs(out - expect)) < 1e-5


def test_resample_sine_quality():
    # Resampling a sine should keep high fidelity away from Nyquist.
    n = 1 << 14
    f = 440.0
    t = np.arange(n) / 44100.0
    data = np.sin(2 * np.pi * f * t).astype(np.float32)
    ctx = _mono_ctx()
    buf = ga.PlayableAudioBuffer.from_mono_array(data, 44100)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(4096)[0]
    rate = 44100.0 / 48000.0
    x = (np.arange(4096) * rate + 1.0) / 44100.0
    ideal = np.sin(2 * np.pi * f * x)
    # Catmull-Rom on a 440 Hz sine at 44.1k: interpolation error ~1e-4.
    assert np.max(np.abs(out - ideal)) < 5e-4


def test_resample_state_across_renders(rng):
    data = rng.standard_normal(8192).astype(np.float32)
    ctx = _mono_ctx(superblock=1)
    buf = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.playback_rate.value = 1.25
    src.connect(ctx.destination)
    src.start(0)
    parts = [ctx.render(512)[0] for _ in range(3)]
    out = np.concatenate(parts)
    expect = _golden_resample(data, 1.25, len(out))
    assert np.max(np.abs(out - expect)) < 1e-5


def test_resample_with_offset(rng):
    data = rng.standard_normal(8192).astype(np.float32)
    ctx = _mono_ctx()
    buf = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.playback_rate.value = 2.0
    src.connect(ctx.destination)
    src.start(0, offset=1000.0 / SR)
    out = ctx.render(1024)[0]
    expect = _golden_resample(data, 2.0, 1024, start_pos=1000.0)
    assert np.max(np.abs(out - expect)) < 1e-5


def test_resample_loop_seam(rng):
    # Loop wraparound during resampling (reference wrap buffer, :297-313).
    data = rng.standard_normal(1000).astype(np.float32)
    ctx = _mono_ctx()
    buf = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.loop = True
    src.playback_rate.value = 0.75
    src.connect(ctx.destination)
    src.start(0)
    out = ctx.render(4096)[0]

    # Golden: continuous position wrapped into [0, 1000), taps wrapped too.
    rate = 0.75
    n_out = 4096
    expect = np.zeros(n_out, np.float32)
    for j in range(n_out):
        x = 1.0 + j * rate
        x = x % 1000.0
        base = int(np.floor(x))
        t = np.float32(x - base)
        idx = [(base - 1) % 1000, base % 1000, (base + 1) % 1000, (base + 2) % 1000]
        expect[j] = _catmull_rom(*[data[i] for i in idx], t)
    assert np.max(np.abs(out - expect)) < 1e-5


def test_resample_exhaustion_stops(rng):
    data = rng.standard_normal(600).astype(np.float32)
    ctx = _mono_ctx(superblock=1)
    buf = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.playback_rate.value = 2.0
    src.connect(ctx.destination)
    fired = []
    src.on_ended(lambda n: fired.append(1))
    src.start(0)
    out = ctx.render(1024)[0]
    # ~300 output samples available at rate 2; everything after is silence.
    assert np.allclose(out[320:], 0.0)
    assert np.any(out[:290] != 0.0)
    assert fired == [1]


def test_playback_rate_touch_recompiles_to_general_path(rng):
    # A pristine playbackRate starts on the exact copy path; touching it
    # switches to the resampler without losing the playhead.
    data = np.arange(4096, dtype=np.float32)
    ctx = _mono_ctx(superblock=1)
    buf = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    a = ctx.render(256)[0]
    assert np.array_equal(a, data[:256])  # exact copy path
    src.playback_rate.value = 1.0  # touch -> general path
    b = ctx.render(256)[0]
    # General path at rate 1.0 plays from pos+1 (resampler warmup latency).
    expect = _golden_resample(data, 1.0, 256, start_pos=256.0)
    assert np.max(np.abs(b - expect)) < 1e-5


def test_poly_variant_selected_for_constant_rational_rates():
    ctx = _mono_ctx()
    buf = ga.PlayableAudioBuffer.from_mono_array(np.zeros(128, np.float32), 44100)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    assert src.kernel_variant() == ("poly", 147, 160)  # 44.1k -> 48k
    src.playback_rate.value = 0.5
    assert src.kernel_variant() == ("poly", 147, 320)
    # Non-dyadic value -> astronomical q -> general kernel.
    src.playback_rate.value = 1.1
    assert src.kernel_variant()[0] == "resample"
    # Automation events -> general kernel.
    src.playback_rate.value = 1.0
    assert src.kernel_variant()[0] == "poly"
    src.playback_rate.linear_ramp_to_value_at_time(2.0, 1.0)
    assert src.kernel_variant()[0] == "resample"


def test_poly_to_general_transition_keeps_playhead(rng):
    # Mid-render the constant rate is re-scheduled (events added): the stage
    # recompiles onto the general kernel and playback continues seamlessly.
    data = rng.standard_normal(8192).astype(np.float32)
    rate = 44100.0 / 48000.0

    ctx = _mono_ctx()
    buf = ga.PlayableAudioBuffer.from_mono_array(data, 44100)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    assert src.kernel_variant() == ("poly", 147, 160)
    a = ctx.render(1024)[0]
    src.playback_rate.set_value_at_time(1.0, 0.0)  # event -> variant change
    assert src.kernel_variant()[0] == "resample"
    b = ctx.render(1024)[0]
    out = np.concatenate([a, b])
    expect = _golden_resample(data, rate, 2048)
    assert np.max(np.abs(out - expect)) < 1e-5


def test_poly_value_change_recompiles(rng):
    data = rng.standard_normal(8192).astype(np.float32)
    ctx = _mono_ctx()
    buf = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.playback_rate.value = 0.5
    src.connect(ctx.destination)
    src.start(0)
    a = ctx.render(512)[0]
    src.playback_rate.value = 0.25  # (1,2) -> (1,4): must not reuse stale H
    b = ctx.render(512)[0]
    expect_a = _golden_resample(data, 0.5, 512)
    # After 512 outputs at rate .5 the stream position is 512*0.5 = 256.
    expect_b = _golden_resample(data, 0.25, 512, start_pos=256.0)
    assert np.max(np.abs(a - expect_a)) < 1e-5
    assert np.max(np.abs(b - expect_b)) < 1e-5


def test_poly_voices_batch_into_one_stage(rng):
    # Same (p, q) across voices -> one vmapped group sharing one H matrix.
    ctx = _mono_ctx(superblock=4)
    datas = [rng.standard_normal(4096).astype(np.float32) for _ in range(3)]
    for d in datas:
        src = ga.AudioBufferSourceNode(ctx)
        src.buffer = ga.PlayableAudioBuffer.from_mono_array(d, 44100)
        src.connect(ctx.destination)
        src.start(0)
    out = ctx.render(2048)[0]
    ctx._ensure_compiled()
    groups = [
        sp for sp in ctx._compiled.plan
        if sp["kind"] == "group" and sp["bufsrc"] is not None
    ]
    assert len(groups) == 1 and groups[0]["bufsrc"][1] == ("poly", 147, 160)
    rate = 44100.0 / 48000.0
    expect = sum(_golden_resample(d, rate, 2048) for d in datas)
    assert np.max(np.abs(out - expect)) < 2e-5


def test_modulated_playback_rate_on_same_rate_source_is_honored(rng):
    """An audio-rate modulation input on playbackRate must force the
    resample kernel even when the param was never set or scheduled — the
    unity-copy fast path reads no params and would silently discard the
    modulation (regression)."""
    data = rng.standard_normal(8192).astype(np.float32)
    ctx = _mono_ctx()
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(data, SR)  # same rate
    lfo = ga.ConstantSourceNode(ctx)
    lfo.offset.value = -0.5  # rate 1.0 + (-0.5) = 0.5
    lfo.connect(src.playback_rate)
    src.connect(ctx.destination)
    src.start(0)
    lfo.start(0)
    assert src.kernel_variant()[0] == "resample"
    out = ctx.render(1024)[0]
    want = _golden_resample(data, 0.5, 1024)
    np.testing.assert_allclose(out, want, atol=2e-6)


def test_modulated_playback_rate_beyond_window_clamps_not_garbage(rng):
    """Audio-rate modulation has no static bound; rates beyond the
    compiled window's bound clamp to it (graceful ceiling) instead of the
    read positions walking off the window into wrong samples."""
    data = rng.standard_normal(1 << 16).astype(np.float32)
    ctx = _mono_ctx()
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    src.playback_rate.value = 1.0  # touched -> resample; mod doubles bound
    lfo = ga.ConstantSourceNode(ctx)
    lfo.offset.value = 7.0  # pushes rate to 8.0, beyond the compiled bound
    lfo.connect(src.playback_rate)
    src.connect(ctx.destination)
    src.start(0)
    lfo.start(0)
    # The kernel clamps at the compiled window's true capacity (>= the
    # pow2 rate_bound the window was sized for).
    w = type(src)._window_w(ctx.superblock, src.rate_bound(), False)
    cap = max(1, (w - 16) // (ctx.superblock * 128))
    out = ctx.render(1024)[0]
    assert np.isfinite(out).all()
    # The effective rate is exactly the clamp: the output must be the
    # golden resample at the capacity, not garbage from off-window reads.
    want = _golden_resample(data, float(cap), 1024)
    np.testing.assert_allclose(out, want, atol=2e-6)
