"""Sharded voice-scene renderer vs single-device reference computation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import graphaudio_tpu as ga  # noqa: F401  (x64)
from graphaudio_tpu.parallel import ShardedVoiceScene, make_mesh
from graphaudio_tpu.ops.convolve import normalization_scale

SR = 48000


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


def _reference_render(arenas, ir, gains, pans, frames, master=0.5):
    """Numpy mirror: loop voices, equal-power pan, mix, convolve, master gain."""
    V, L = arenas.shape
    mix = np.zeros((2, frames), np.float64)
    for v in range(V):
        idx = np.arange(frames) % L
        s = arenas[v][idx].astype(np.float64) * gains[v]
        x = (pans[v] + 1.0) * 0.5
        mix[0] += s * np.cos(np.float32(x * np.pi / 2))
        mix[1] += s * np.sin(np.float32(x * np.pi / 2))
    scale = normalization_scale(ir)
    ir_n = (ir.astype(np.float32) * np.float32(scale)).astype(np.float64)
    out = np.stack([np.convolve(mix[c], ir_n)[:frames] for c in range(2)])
    return out * master


def test_sharded_scene_matches_reference(mesh, rng):
    V = 8
    arenas = (rng.standard_normal((V, 1000)) * 0.2).astype(np.float32)
    ir = (rng.standard_normal(500) * 0.3).astype(np.float32)
    gains = rng.uniform(0.2, 1.0, V).astype(np.float32)
    pans = np.linspace(-1, 1, V).astype(np.float32)

    scene = ShardedVoiceScene(mesh, arenas, ir, gains, pans, superblock=2)
    step = scene.jitted_step()
    state = scene.init_state()
    outs = []
    for i in range(4):
        state, out = step(state, i)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1)

    expect = _reference_render(arenas, ir, gains, pans, got.shape[1])
    assert np.max(np.abs(got - expect)) < 1e-5


def test_mesh_factorization():
    devs = jax.devices()
    if len(devs) >= 8:
        m = make_mesh(devs[:8])
        assert m.shape["voice"] * m.shape["part"] == 8
    m1 = make_mesh(devs[:1])
    assert m1.shape["voice"] * m1.shape["part"] == 1


def test_context_mesh_sharding_matches_single_device(rng):
    """OfflineAudioContext.set_mesh: voice groups shard over the mesh and the
    rendered audio matches single-device execution (psum reorder rounding)."""
    from jax.sharding import Mesh

    import graphaudio_tpu as ga

    sr = 48000

    def build(mesh):
        ctx = ga.OfflineAudioContext(sample_rate=sr, superblock=4)
        if mesh is not None:
            ctx.set_mesh(mesh)
        sink = ga.GainNode(ctx)
        sink.gain.value = 0.8
        sink.connect(ctx.destination)
        r = np.random.default_rng(7)
        for v in range(8):
            buf = ga.PlayableAudioBuffer.from_mono_array(
                (r.standard_normal(4800) * 0.1).astype(np.float32), sr
            )
            src = ga.AudioBufferSourceNode(ctx)
            src.buffer = buf
            src.loop = True
            g = ga.GainNode(ctx)
            g.gain.value = 1.0 / (v + 1)
            src.connect(g).connect(sink)
            src.start(0)
        return ctx

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.array(devs[:4]).reshape(4), axis_names=("voice",))
    ref_ctx, ctx = build(None), build(mesh)
    ref, out = ref_ctx.render(4096), ctx.render(4096)
    assert ctx._compiled.sharded_stages, "voice groups did not shard"
    assert np.abs(out - ref).max() < 1e-6
    # continuity across steps under sharding
    assert np.abs(ctx.render(4096) - ref_ctx.render(4096)).max() < 1e-6


def test_context_part_sharded_convolver_matches_single_device(rng):
    """Integrated voice x part mesh: the ConvolverNode's IR partitions shard
    over 'part' (psum-completed spectral MAC) while voices shard over
    'voice' — and the render matches the single-device one.
    Ref: PartitionedConvolver.cs:154-223 (the distributed accumulation)."""

    def build(mesh):
        ctx = ga.OfflineAudioContext(sample_rate=48000, superblock=8)
        if mesh is not None:
            ctx.set_mesh(mesh)
        r = np.random.default_rng(21)
        master = ga.GainNode(ctx)
        master.gain.value = 0.7
        conv = ga.ConvolverNode(ctx)
        ir = (r.standard_normal(1024 * 3) * 0.2).astype(np.float32)
        conv.buffer = ga.PlayableAudioBuffer.from_stereo_arrays(
            ir, ir[::-1].copy(), 48000
        )
        conv.connect(master).connect(ctx.destination)
        for v in range(4):
            buf = ga.PlayableAudioBuffer.from_mono_array(
                (r.standard_normal(4096) * 0.1).astype(np.float32), 48000
            )
            src = ga.AudioBufferSourceNode(ctx)
            src.buffer = buf
            src.loop = True
            src.connect(conv)
            src.start(0)
        return ctx

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs >= 8 devices")
    mesh = make_mesh(devs[:8])  # voice x part
    assert mesh.shape["part"] > 1
    ctx, ref_ctx = build(mesh), build(None)
    out, ref = ctx.render(4096), ref_ctx.render(4096)
    assert ctx._compiled.part_sharded, "convolver did not part-shard"
    assert np.abs(out - ref).max() < 1e-5
    # delay-line continuity across steps under sharding
    assert np.abs(ctx.render(4096) - ref_ctx.render(4096)).max() < 1e-5


def test_context_mesh_shards_spatial_voices(rng):
    """A binaural scene's spatial-panner group shards over the 'voice' mesh
    axis (sources -> CHAIN panners -> psum fan-in) and matches the
    single-device render — the multi-chip path for BASELINE config 5."""
    from jax.sharding import Mesh

    import graphaudio_tpu as ga
    from graphaudio_tpu.nodes.spatial import SpatialPannerNode

    sr = 48000

    def build(mesh):
        ctx = ga.OfflineAudioContext(sample_rate=sr, superblock=4)
        if mesh is not None:
            ctx.set_mesh(mesh)
        ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
        r = np.random.default_rng(11)
        for v in range(8):
            buf = ga.PlayableAudioBuffer.from_mono_array(
                (r.standard_normal(4800) * 0.1).astype(np.float32), sr
            )
            src = ga.AudioBufferSourceNode(ctx)
            src.buffer = buf
            src.loop = True
            pan = SpatialPannerNode(ctx)
            ang = 2 * np.pi * v / 8
            pan.position_x.value = 3 * np.cos(ang)
            pan.position_z.value = 3 * np.sin(ang)
            src.connect(pan).connect(ctx.destination)
            src.start(0)
        return ctx

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.array(devs[:4]).reshape(4), axis_names=("voice",))
    ref_ctx, ctx = build(None), build(mesh)
    ref, out = ref_ctx.render(2048), ctx.render(2048)
    spatial_sharded = any(
        ctx._compiled.plan[si]["group_key"]
        and ctx._compiled.plan[si]["group_key"][0] == "spatial-panner"
        for si in ctx._compiled.sharded_stages
    )
    assert spatial_sharded, "spatial-panner group did not shard"
    assert np.abs(out - ref).max() < 1e-6
