"""SpatialPannerNode: direct path math + HRTF behavior."""

import numpy as np

import graphaudio_tpu as ga
from graphaudio_tpu.nodes.spatial import DistanceModelType, SpatialPannerNode

SR = 48000


def _scene(distance_model=DistanceModelType.INVERSE, superblock=2):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    src = ga.ConstantSourceNode(ctx)
    src.start(0)
    sp = SpatialPannerNode(ctx)
    sp.distance_model = distance_model
    src.connect(sp).connect(ctx.destination)
    return ctx, sp


def _rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def test_lateralization():
    ctx, sp = _scene()
    sp.position_x.value = 5.0  # listener's right
    out = ctx.render(4096)
    assert _rms(out[1, 2048:]) > _rms(out[0, 2048:])
    sp.position_x.value = -5.0  # left
    ctx.render(4096)  # flush transition
    out = ctx.render(4096)
    assert _rms(out[0, 2048:]) > _rms(out[1, 2048:])


def test_inverse_distance_attenuation():
    ctx, sp = _scene()
    sp.position_x.value = 2.0
    a = _rms(ctx.render(4096)[:, 2048:])
    sp.position_x.value = 20.0
    ctx.render(4096)
    b = _rms(ctx.render(4096)[:, 2048:])
    # inverse model: ref/d -> 10x distance = 10x quieter
    assert abs(a / b - 10.0) < 0.5


def test_linear_distance_model():
    ctx, sp = _scene(DistanceModelType.LINEAR)
    sp.ref_distance.value = 1.0
    sp.max_distance.value = 11.0
    sp.position_z.value = -6.0  # ahead, distance 6
    out = ctx.render(4096)
    # linear: 1 - (6-1)/(11-1) = 0.5
    ctx2, sp2 = _scene(DistanceModelType.LINEAR)
    sp2.ref_distance.value = 1.0
    sp2.max_distance.value = 11.0
    sp2.position_z.value = -1.0  # at ref distance -> gain 1
    ref = ctx2.render(4096)
    ratio = _rms(out[:, 2048:]) / _rms(ref[:, 2048:])
    assert abs(ratio - 0.5) < 0.05


def test_exponential_distance_model():
    ctx, sp = _scene(DistanceModelType.EXPONENTIAL)
    sp.rolloff_factor.value = 2.0
    sp.position_z.value = -4.0
    out = ctx.render(4096)
    ctx2, sp2 = _scene(DistanceModelType.EXPONENTIAL)
    sp2.rolloff_factor.value = 2.0
    sp2.position_z.value = -2.0
    ref = ctx2.render(4096)
    # (4/2)^-2 = 1/4 relative
    ratio = _rms(out[:, 2048:]) / _rms(ref[:, 2048:])
    assert abs(ratio - 0.25) < 0.03


def test_cone_directivity():
    # Source ahead of listener, pointing AWAY (listener outside the cone).
    ctx, sp = _scene()
    sp.position_z.value = -2.0
    sp.cone_inner_angle.value = 60.0
    sp.cone_outer_angle.value = 90.0
    sp.cone_outer_gain.value = 0.25
    # Source at (0,0,-2): direction source->listener is +z, so orientation
    # (0,0,1) faces the listener (reference computes dot(orientation,
    # -worldDirection) with worldDirection = listener->source).
    sp.orientation_x.value = 0.0
    sp.orientation_z.value = 1.0  # facing the listener
    facing = _rms(ctx.render(4096)[:, 2048:])
    sp.orientation_z.value = -1.0  # facing away
    ctx.render(4096)
    away = _rms(ctx.render(4096)[:, 2048:])
    assert abs(away / facing - 0.25) < 0.05


def test_spatial_blend_zero_is_dry():
    ctx, sp = _scene()
    sp.position_x.value = 3.0
    sp.spatial_blend.value = 0.0
    out = ctx.render(4096)
    # dry path: mono source upmixed identically to both ears
    assert np.allclose(out[0, 2048:], out[1, 2048:], atol=1e-6)


def test_occlusion_attenuates():
    ctx, sp = _scene()
    sp.position_z.value = -2.0
    open_rms = _rms(ctx.render(4096)[:, 2048:])
    sp.occlusion.value = 1.0
    ctx.render(4096)
    occluded = _rms(ctx.render(4096)[:, 2048:])
    assert occluded < open_rms * 0.05

    # transmission lets the low band through
    sp.transmission_low.value = 0.8
    ctx.render(4096)
    trans = _rms(ctx.render(4096)[:, 2048:])
    assert trans > occluded * 5


def test_itd_present():
    # A click from the right arrives earlier in the right ear.
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    click = np.zeros(4096, np.float32)
    click[64] = 1.0
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(click, SR)
    sp = SpatialPannerNode(ctx)
    src.connect(sp).connect(ctx.destination)
    sp.position_x.value = 10.0
    src.start(0)
    out = ctx.render(1024)
    peak_l = int(np.argmax(np.abs(out[0])))
    peak_r = int(np.argmax(np.abs(out[1])))
    assert peak_r < peak_l  # right ear leads
    # Woodworth max ITD ~ (a/c)(pi/2+1) ~ 0.66ms ~ 31 samples; expect > 10.
    assert 5 <= peak_l - peak_r <= 40


def test_batched_spatial_voices(rng):
    # Several panners with the same config batch into one vmapped stage.
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    for i in range(4):
        src = ga.ConstantSourceNode(ctx)
        src.offset.value = 0.1
        src.start(0)
        sp = SpatialPannerNode(ctx)
        sp.position_x.value = float(i - 2)
        src.connect(sp).connect(ctx.destination)
    from graphaudio_tpu.core.graph import CompiledGraph

    cg = CompiledGraph(ctx)
    kinds = {(k, len(ns), type(ns[0]).__name__) for k, ns, _ in cg.stages}
    assert ("group", 4, "SpatialPannerNode") in kinds
    out = ctx.render(2048)
    assert np.isfinite(out).all() and np.abs(out).max() > 0
