"""ConvolverNode vs direct np.convolve (with the reference's normalization)."""

import numpy as np

import graphaudio_tpu as ga
from graphaudio_tpu.ops.convolve import normalization_scale, prepare_ir

SR = 48000


def _golden_conv(x, ir, normalize=True):
    """Linear convolution of x with the normalized IR (float64 golden)."""
    scale = normalization_scale(ir) if normalize else 1.0
    # The reference rounds the scaled IR to float32 before transforming
    # (PartitionedConvolver.cs:79-80).
    ir_scaled = (ir.astype(np.float32) * np.float32(scale)).astype(np.float32)
    return np.convolve(x.astype(np.float64), ir_scaled.astype(np.float64))[: len(x)]


def _mono_ctx(superblock=2):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    ctx.destination.set_channel_count(1)
    ctx.destination.inputs[0].set_channel_count_mode(ga.ChannelCountMode.EXPLICIT)
    return ctx


def _run_convolver(x, ir_channels, normalize=True, superblock=2, render=None,
                   in_channels=1):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    n = len(x[0]) if isinstance(x, list) else len(x)
    xs = x if isinstance(x, list) else [x]
    buf = ga.PlayableAudioBuffer.from_channel_arrays(xs, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    conv = ga.ConvolverNode(ctx)
    conv.normalize = normalize
    conv.buffer = ga.PlayableAudioBuffer.from_channel_arrays(ir_channels, SR)
    src.connect(conv).connect(ctx.destination)
    src.start(0)
    frames = render or (n - 128)
    return ctx.render(frames)


def test_short_ir_identity_impulse(rng):
    # IR = unit impulse (unnormalized) => output == input.
    x = rng.standard_normal(1024).astype(np.float32) * 0.5
    ir = np.zeros(16, np.float32)
    ir[0] = 1.0
    out = _run_convolver(x, [ir], normalize=False)
    assert np.max(np.abs(out[0] - x[: out.shape[1]])) < 1e-5


def test_mono_convolution_matches_numpy(rng):
    x = rng.standard_normal(2048).astype(np.float32) * 0.5
    ir = (rng.standard_normal(700) * np.exp(-np.arange(700) / 200.0)).astype(np.float32)
    out = _run_convolver(x, [ir], normalize=True)
    expect = _golden_conv(x, ir)[: out.shape[1]]
    assert np.max(np.abs(out[0] - expect)) < 1e-5


def test_multi_partition_long_ir(rng):
    # IR spanning many 128-frame partitions.
    x = rng.standard_normal(4096).astype(np.float32) * 0.5
    ir = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    out = _run_convolver(x, [ir], normalize=True, superblock=4)
    expect = _golden_conv(x, ir)[: out.shape[1]]
    assert np.max(np.abs(out[0] - expect)) < 1e-5


def test_state_carries_across_renders(rng):
    x = rng.standard_normal(2048).astype(np.float32) * 0.5
    ir = (rng.standard_normal(512) * 0.2).astype(np.float32)
    ctx = _mono_ctx(superblock=1)
    buf = ga.PlayableAudioBuffer.from_mono_array(x, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    conv = ga.ConvolverNode(ctx)
    conv.buffer = ga.PlayableAudioBuffer.from_mono_array(ir, SR)
    src.connect(conv).connect(ctx.destination)
    src.start(0)
    parts = [ctx.render(384)[0] for _ in range(4)]
    out = np.concatenate(parts)
    expect = _golden_conv(x, ir)[: len(out)]
    assert np.max(np.abs(out - expect)) < 1e-5


def test_normalization_scale_reference_constants():
    # scale = (1/power) * 10^(-58/20), power floored at 1.25e-4
    # (PartitionedConvolver.cs:93-102).
    ir = np.ones(100, np.float32)
    assert abs(normalization_scale(ir) - 10 ** (-58 / 20.0)) < 1e-9
    tiny = np.full(100, 1e-6, np.float32)
    assert abs(normalization_scale(tiny) - (1 / 0.000125) * 10 ** (-58 / 20.0)) < 1e-3


def test_true_stereo_four_channel_ir(rng):
    # 4-channel IR => True-Stereo matrix: outL = L*ir0 + R*ir2, outR = L*ir1 + R*ir3
    # (ConvolverNode.cs:127-144).
    xl = rng.standard_normal(1024).astype(np.float32) * 0.5
    xr = rng.standard_normal(1024).astype(np.float32) * 0.5
    irs = [(rng.standard_normal(300) * 0.2).astype(np.float32) for _ in range(4)]
    out = _run_convolver([xl, xr], irs, normalize=True)
    el = _golden_conv(xl, irs[0]) + _golden_conv(xr, irs[2])
    er = _golden_conv(xl, irs[1]) + _golden_conv(xr, irs[3])
    n = out.shape[1]
    assert out.shape[0] == 2
    assert np.max(np.abs(out[0] - el[:n])) < 1e-5
    assert np.max(np.abs(out[1] - er[:n])) < 1e-5


def test_discrete_stereo_ir(rng):
    # 2-channel IR: channel-wise discrete convolution, input forced to 2ch.
    xl = rng.standard_normal(1024).astype(np.float32) * 0.5
    xr = rng.standard_normal(1024).astype(np.float32) * 0.5
    irs = [(rng.standard_normal(256) * 0.3).astype(np.float32) for _ in range(2)]
    out = _run_convolver([xl, xr], irs, normalize=True)
    n = out.shape[1]
    assert np.max(np.abs(out[0] - _golden_conv(xl, irs[0])[:n])) < 1e-5
    assert np.max(np.abs(out[1] - _golden_conv(xr, irs[1])[:n])) < 1e-5


def test_ir_sample_rate_mismatch_rejected():
    ctx = _mono_ctx()
    conv = ga.ConvolverNode(ctx)
    ir = ga.PlayableAudioBuffer.from_mono_array(np.ones(64, np.float32), 44100)
    try:
        conv.buffer = ir
        assert False, "expected error"
    except RuntimeError:
        pass


def test_prepare_ir_shape():
    hr, hi = prepare_ir(np.ones(300, np.float32))
    assert hr.shape == (3, 129) and hi.shape == (3, 129)
    assert hr.dtype == np.float32 and hi.dtype == np.float32


# ---- big-path (superblock-grain and sub-blocked) partitioning ---------------


def test_big_path_unsplit_grain(rng):
    # T = 8*128 = 1024: grain == T, conv_superblock_big (one 2T-pt DFT/step).
    x = rng.standard_normal(4096).astype(np.float32) * 0.5
    ir = (rng.standard_normal(1500) * np.exp(-np.arange(1500) / 400.0)).astype(
        np.float32
    )
    out = _run_convolver(x, [ir], normalize=True, superblock=8, render=2048)
    expect = _golden_conv(x, ir)[: out.shape[1]]
    assert np.max(np.abs(out[0] - expect)) < 1e-5


def test_sub_blocked_grain(rng):
    # T = 16*128 = 2048: grain 1024, L=2 sub-blocks (conv_superblock_sub).
    x = rng.standard_normal(8192).astype(np.float32) * 0.5
    ir = (rng.standard_normal(3000) * np.exp(-np.arange(3000) / 800.0)).astype(
        np.float32
    )
    out = _run_convolver(x, [ir], normalize=True, superblock=16, render=4096)
    expect = _golden_conv(x, ir)[: out.shape[1]]
    assert np.max(np.abs(out[0] - expect)) < 1e-5


def test_sub_blocked_non_pow2_superblock(rng):
    # T = 24*128 = 3072: grain 1024, L=3 (odd split).
    x = rng.standard_normal(8192).astype(np.float32) * 0.5
    ir = (rng.standard_normal(2200) * 0.1).astype(np.float32)
    out = _run_convolver(x, [ir], normalize=True, superblock=24, render=6144)
    expect = _golden_conv(x, ir)[: out.shape[1]]
    assert np.max(np.abs(out[0] - expect)) < 1e-5


def test_sub_blocked_state_across_renders(rng):
    # Sub-blocked delay line + overlap carry across independent render calls.
    x = rng.standard_normal(8192).astype(np.float32) * 0.5
    ir = (rng.standard_normal(2500) * 0.15).astype(np.float32)
    ctx = _mono_ctx(superblock=16)
    buf = ga.PlayableAudioBuffer.from_mono_array(x, SR)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    conv = ga.ConvolverNode(ctx)
    conv.buffer = ga.PlayableAudioBuffer.from_mono_array(ir, SR)
    src.connect(conv).connect(ctx.destination)
    src.start(0)
    parts = [ctx.render(2048)[0] for _ in range(3)]
    out = np.concatenate(parts)
    expect = _golden_conv(x, ir)[: len(out)]
    assert np.max(np.abs(out - expect)) < 1e-5


def test_sub_blocked_true_stereo(rng):
    # True-Stereo matrix on the sub-blocked path.
    xl = rng.standard_normal(4096).astype(np.float32) * 0.5
    xr = rng.standard_normal(4096).astype(np.float32) * 0.5
    irs = [(rng.standard_normal(1800) * 0.2).astype(np.float32) for _ in range(4)]
    out = _run_convolver([xl, xr], irs, normalize=True, superblock=16,
                         render=2048)
    el = _golden_conv(xl, irs[0]) + _golden_conv(xr, irs[2])
    er = _golden_conv(xl, irs[1]) + _golden_conv(xr, irs[3])
    n = out.shape[1]
    assert np.max(np.abs(out[0] - el[:n])) < 1e-5
    assert np.max(np.abs(out[1] - er[:n])) < 1e-5


def test_pick_big_grain_rules():
    from graphaudio_tpu.nodes.convolver import _pick_big_grain

    assert _pick_big_grain(8192) == 1024  # flagship superblock 64
    assert _pick_big_grain(4096) == 1024
    assert _pick_big_grain(1024) == 1024  # == T: unsplit
    assert _pick_big_grain(3072) == 1024  # L=3
    assert _pick_big_grain(1280) == 640  # only smaller divisors exist
    assert _pick_big_grain(1664) == 1664  # 13*128: no 128-multiple divisor
    # in [512, 1024] (13 is prime), so the superblock stays unsplit
