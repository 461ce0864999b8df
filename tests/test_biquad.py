"""BiQuadFilterNode vs scipy.signal.lfilter (RBJ cookbook golden)."""

import numpy as np
import scipy.signal as sps

import graphaudio_tpu as ga

SR = 48000


def _rbj(filter_type, f, q, gain_db, sr=SR):
    """Float64 RBJ coefficients mirroring BiQuadFilterNode.UpdateCoefficients."""
    w0 = 2 * np.pi * f / sr
    cosw, sinw = np.cos(w0), np.sin(w0)
    alpha = sinw / (2 * q)
    A = 10.0 ** (gain_db / 40.0)
    if filter_type == "lowpass":
        b = [(1 - cosw) / 2, 1 - cosw, (1 - cosw) / 2]
        a = [1 + alpha, -2 * cosw, 1 - alpha]
    elif filter_type == "highpass":
        b = [(1 + cosw) / 2, -(1 + cosw), (1 + cosw) / 2]
        a = [1 + alpha, -2 * cosw, 1 - alpha]
    elif filter_type == "bandpass":
        b = [alpha, 0.0, -alpha]
        a = [1 + alpha, -2 * cosw, 1 - alpha]
    elif filter_type == "notch":
        b = [1.0, -2 * cosw, 1.0]
        a = [1 + alpha, -2 * cosw, 1 - alpha]
    elif filter_type == "allpass":
        b = [1 - alpha, -2 * cosw, 1 + alpha]
        a = [1 + alpha, -2 * cosw, 1 - alpha]
    elif filter_type == "peaking":
        b = [1 + alpha * A, -2 * cosw, 1 - alpha * A]
        a = [1 + alpha / A, -2 * cosw, 1 - alpha / A]
    elif filter_type == "lowshelf":
        beta = np.sqrt(A) / q
        b = [
            A * ((A + 1) - (A - 1) * cosw + beta * sinw),
            2 * A * ((A - 1) - (A + 1) * cosw),
            A * ((A + 1) - (A - 1) * cosw - beta * sinw),
        ]
        a = [
            (A + 1) + (A - 1) * cosw + beta * sinw,
            -2 * ((A - 1) + (A + 1) * cosw),
            (A + 1) + (A - 1) * cosw - beta * sinw,
        ]
    elif filter_type == "highshelf":
        beta = np.sqrt(A) / q
        b = [
            A * ((A + 1) + (A - 1) * cosw + beta * sinw),
            -2 * A * ((A - 1) + (A + 1) * cosw),
            A * ((A + 1) + (A - 1) * cosw - beta * sinw),
        ]
        a = [
            (A + 1) - (A - 1) * cosw + beta * sinw,
            2 * ((A - 1) - (A + 1) * cosw),
            (A + 1) - (A - 1) * cosw - beta * sinw,
        ]
    else:
        raise ValueError(filter_type)
    b = np.array(b) / a[0]
    a = np.array(a) / a[0]
    return b, a


def _filter_graph(ftype, f, q, g_db, x):
    # Mono source upmixes to the filter's default 2-channel input (Max mode),
    # matching the reference; compare channel 0 of the stereo destination.
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    buf = ga.PlayableAudioBuffer.from_mono_array(x, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    flt = ga.BiQuadFilterNode(ctx, type=ftype)
    flt.frequency.value = f
    flt.q.value = q
    flt.gain.value = g_db
    src.connect(flt).connect(ctx.destination)
    src.start(0)
    return ctx.render(len(x) - 128)[0]  # skip reference's cleared final block


def test_all_filter_types_match_scipy(rng):
    x = rng.standard_normal(4096).astype(np.float32) * 0.5
    # Tolerances vs the float64 golden: high-Q resonators near DC are
    # intrinsically f32-limited — the reference's own sequential float32
    # recurrence deviates ~6e-4 from float64 on the Q=10 notch below; our
    # parallel scan is the same error class.
    cases = [
        (ga.FilterType.LOWPASS, 1000.0, 0.707, 0.0, 2e-4),
        (ga.FilterType.HIGHPASS, 2000.0, 1.0, 0.0, 2e-4),
        (ga.FilterType.BANDPASS, 1500.0, 2.0, 0.0, 2e-4),
        (ga.FilterType.NOTCH, 60.0, 10.0, 0.0, 3e-3),
        (ga.FilterType.ALLPASS, 800.0, 0.5, 0.0, 2e-4),
        (ga.FilterType.PEAKING, 3000.0, 1.5, 6.0, 2e-4),
        (ga.FilterType.LOWSHELF, 250.0, 0.9, -9.0, 2e-4),
        (ga.FilterType.HIGHSHELF, 8000.0, 0.8, 4.5, 2e-4),
    ]
    for ftype, f, q, g, tol in cases:
        out = _filter_graph(ftype, f, q, g, x)
        b, a = _rbj(ftype.value, f, q, g)
        expect = sps.lfilter(b, a, x.astype(np.float64))[: len(out)]
        err = np.max(np.abs(out - expect))
        assert err < tol, (ftype, err)


def test_impulse_response_lowpass():
    x = np.zeros(1024, np.float32)
    x[0] = 1.0
    out = _filter_graph(ga.FilterType.LOWPASS, 400.0, 0.707, 0.0, x)
    b, a = _rbj("lowpass", 400.0, 0.707, 0.0)
    expect = sps.lfilter(b, a, x.astype(np.float64))[: len(out)]
    assert np.max(np.abs(out - expect)) < 1e-5


def test_state_carries_across_render_calls(rng):
    x = rng.standard_normal(2048).astype(np.float32)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    buf = ga.PlayableAudioBuffer.from_mono_array(x, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    flt = ga.BiQuadFilterNode(ctx, type=ga.FilterType.LOWPASS)
    flt.frequency.value = 500.0
    src.connect(flt).connect(ctx.destination)
    src.start(0)
    parts = [ctx.render(512)[0] for _ in range(3)]
    out = np.concatenate(parts)
    b, a = _rbj("lowpass", 500.0, 1.0, 0.0)
    expect = sps.lfilter(b, a, x.astype(np.float64))[:1536]
    assert np.max(np.abs(out - expect)) < 1e-4


def test_automated_frequency_sweep_matches_sequential_mirror(rng):
    # Golden: a sequential per-sample implementation with per-sample
    # coefficient recomputation (our documented semantics).
    x = rng.standard_normal(2048).astype(np.float32) * 0.5
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    buf = ga.PlayableAudioBuffer.from_mono_array(x, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    flt = ga.BiQuadFilterNode(ctx, type=ga.FilterType.LOWPASS)
    flt.frequency.set_value_at_time(200.0, 0.0)
    flt.frequency.linear_ramp_to_value_at_time(4000.0, 1024.0 / SR)
    src.connect(flt).connect(ctx.destination)
    src.start(0)
    out = ctx.render(1024)[0]

    t = np.arange(1024) / SR
    freqs = np.where(
        t < 1024.0 / SR, 200.0 + (4000.0 - 200.0) * (t * SR / 1024.0), 4000.0
    )
    w1 = w2 = 0.0
    expect = np.zeros(1024)
    for i in range(1024):
        b, a = _rbj("lowpass", freqs[i], 1.0, 0.0)
        w = x[i] - a[1] * w1 - a[2] * w2
        expect[i] = b[0] * w + b[1] * w1 + b[2] * w2
        w2, w1 = w1, w
    # f32 floor: the resonant low-frequency section amplifies the internal
    # state ~1/w0^2, so f32 rounding alone contributes ~2e-4 here.
    assert np.max(np.abs(out - expect)) < 2e-3


def test_cascaded_eq_chain(rng):
    x = rng.standard_normal(2048).astype(np.float32) * 0.25
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    buf = ga.PlayableAudioBuffer.from_mono_array(x, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    stages = [
        (ga.FilterType.LOWPASS, 8000.0, 0.707, 0.0),
        (ga.FilterType.PEAKING, 1000.0, 1.2, 3.0),
        (ga.FilterType.PEAKING, 3000.0, 2.0, -4.0),
        (ga.FilterType.HIGHPASS, 80.0, 0.707, 0.0),
    ]
    node = src
    for ftype, f, q, g in stages:
        flt = ga.BiQuadFilterNode(ctx, type=ftype)
        flt.frequency.value = f
        flt.q.value = q
        flt.gain.value = g
        node = node.connect(flt)
    node.connect(ctx.destination)
    src.start(0)
    out = ctx.render(1024)[0]
    expect = x.astype(np.float64)[:1024]
    for ftype, f, q, g in stages:
        b, a = _rbj(ftype.value, f, q, g)
        expect = sps.lfilter(b, a, expect)
    assert np.max(np.abs(out - expect)) < 5e-4


def test_first_order_matmul_matches_scan(rng):
    """The blocked kernel-matmul time-varying solver (kept for small-T
    regimes and cross-validation) agrees with the associative scan and a
    sequential f64 reference on random time-varying poles."""
    from graphaudio_tpu.ops.biquad import (
        _first_order_scan,
        _make_first_order_matmul,
    )
    import jax.numpy as jnp

    T, C = 1024, 2
    r = rng.uniform(0.0, 0.9999, T)
    th = rng.uniform(-np.pi, np.pi, T)
    p = (r * np.exp(1j * th)).astype(np.complex64)
    u = (
        rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))
    ).astype(np.complex64)
    s0 = (rng.standard_normal(C) + 1j * rng.standard_normal(C)).astype(
        np.complex64
    )
    ref = np.zeros((C, T), np.complex128)
    s = s0.astype(np.complex128)
    for t in range(T):
        s = complex(p[t]) * s + u[:, t]
        ref[:, t] = s
    scan = np.asarray(
        _first_order_scan(jnp.asarray(p), jnp.asarray(u), jnp.asarray(s0))
    )
    mm = np.asarray(
        _make_first_order_matmul(jnp.asarray(p))(jnp.asarray(u), jnp.asarray(s0))
    )
    scale = np.abs(ref).max()
    assert np.abs(scan - ref).max() / scale < 1e-6
    assert np.abs(mm - ref).max() / scale < 1e-5
    assert np.abs(mm - scan).max() / scale < 1e-5


def test_biquad_apply_tv_methods_agree(rng):
    """scan and matmul tv_methods produce the same filtered audio."""
    from graphaudio_tpu.ops.biquad import biquad_apply, rbj_coefficients
    import jax.numpy as jnp

    T, C = 512, 2
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32) * 0.3)
    f = jnp.asarray(
        np.linspace(300.0, 4000.0, T).astype(np.float32)
    )
    q = jnp.asarray(np.linspace(0.5, 4.0, T).astype(np.float32))
    coeffs = rbj_coefficients("peaking", f, q, 3.0, 48000.0)
    w1 = jnp.zeros((C,), jnp.float32)
    w2 = jnp.zeros((C,), jnp.float32)
    ys, _, _ = biquad_apply(x, coeffs, w1, w2, time_varying=True,
                            tv_method="scan")
    ym, _, _ = biquad_apply(x, coeffs, w1, w2, time_varying=True,
                            tv_method="matmul")
    assert np.max(np.abs(np.asarray(ys) - np.asarray(ym))) < 1e-5


def test_pair_scan_matches_scalar_scans(rng):
    """The triangular pair scan (recorded dead end; see its docstring)
    stays numerically pinned to the chained scalar scans."""
    from graphaudio_tpu.ops.biquad import _first_order_scan, _pair_scan
    import jax.numpy as jnp

    T, C = 1024, 2
    r = rng.uniform(0.2, 0.9999, T)
    th = rng.uniform(-np.pi, np.pi, T)
    p1 = jnp.asarray((r * np.exp(1j * th)).astype(np.complex64))
    p2 = jnp.conj(p1)
    x = jnp.asarray(
        (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))
         ).astype(np.complex64)
    )
    v0 = jnp.asarray((rng.standard_normal(C)).astype(np.complex64))
    w0 = jnp.asarray((rng.standard_normal(C)).astype(np.complex64))
    v_ref = _first_order_scan(p1, x, v0)
    w_ref = _first_order_scan(p2, v_ref, w0)
    v, w = _pair_scan(p1, p2, x, v0, w0)
    scale = float(np.abs(np.asarray(w_ref)).max())
    assert np.abs(np.asarray(v) - np.asarray(v_ref)).max() / scale < 1e-5
    assert np.abs(np.asarray(w) - np.asarray(w_ref)).max() / scale < 1e-5


def _df2_golden(x, coef_fn):
    """Direct Form II with per-sample coefficients — the reference's
    recurrence (w = x - a1 w1 - a2 w2; y = b0 w + b1 w1 + b2 w2,
    BiQuadFilterNode.cs:117-125). At a coefficient change, carrying the
    DF-II internal state differs from carrying lfilter's TDF-II zi, so
    step-change goldens must use THIS form."""
    w1 = w2 = 0.0
    out = np.zeros(len(x), np.float32)
    for i, xi in enumerate(x):
        b, a = coef_fn(i)
        w = xi - a[1] * w1 - a[2] * w2
        out[i] = b[0] * w + b[1] * w1 + b[2] * w2
        w2, w1 = w1, w
    return out


def test_peaking_gain_automation_uses_time_varying_poles(rng):
    """Gain enters the a1/a2 DENOMINATOR for peaking/shelving types, so a
    scheduled gain change must take the time-varying pole path (regression:
    only frequency/Q gated it, and the constant-pole kernel froze the
    pre-event poles — ~16% error after the event)."""
    x = (rng.standard_normal(2176) * 0.5).astype(np.float32)  # +128: skip
    n_pre = 1024  # gain event at exactly 1024 samples    final-block clear
    t_event = n_pre / SR

    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(x, SR)
    flt = ga.BiQuadFilterNode(ctx, type=ga.FilterType.PEAKING)
    flt.frequency.value = 1200.0
    flt.q.value = 2.0
    flt.gain.value = 0.0
    flt.gain.set_value_at_time(18.0, t_event)
    src.connect(flt).connect(ctx.destination)
    src.start(0)
    out = ctx.render(2048)[0]

    b0, a0 = _rbj("peaking", 1200.0, 2.0, 0.0)
    b1, a1 = _rbj("peaking", 1200.0, 2.0, 18.0)
    want = _df2_golden(
        x[:2048], lambda i: (b0, a0) if i < n_pre else (b1, a1)
    )
    np.testing.assert_allclose(out, want, atol=5e-5)


def test_lowpass_gain_event_keeps_constant_kernel():
    """Gain does not reach the poles (or numerator) of non-shelving types:
    scheduling a gain event must not recompile or change output."""
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    src = ga.ConstantSourceNode(ctx)
    flt = ga.BiQuadFilterNode(ctx, type=ga.FilterType.LOWPASS)
    src.connect(flt).connect(ctx.destination)
    src.start(0)
    assert not flt._time_varying()
    flt.gain.set_value_at_time(12.0, 0.0)  # ignored by lowpass
    assert not flt._time_varying()
    out = ctx.render(512)
    assert np.isfinite(out).all()


def test_failed_start_is_recoverable(rng):
    """start() with no buffer raises BUT leaves the node startable once a
    buffer is assigned (regression: flags flipped before validation)."""
    import pytest
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    src = ga.AudioBufferSourceNode(ctx)
    with pytest.raises(RuntimeError, match="buffer"):
        src.start(0, 0, duration=1.0)
    data = (rng.standard_normal(512) * 0.3).astype(np.float32)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    src.connect(ctx.destination)
    src.start(0)  # must not raise "can only be started once"
    out = ctx.render(512)
    assert float(np.abs(out).max()) > 0
