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


def test_context_part_sharded_hrtf_matches_single_device(rng):
    """A long measured per-node HRIR's kernel partitions shard over the
    mesh's 'part' axis (psum-completed spectral MAC, like the convolver's
    IR partitions) while the voice group shards over 'voice' — and a
    MOVING source renders identically to the single-device path.
    Ref: the HRTF render of SpatialPannerNode.cs:250-260, distributed."""
    from graphaudio_tpu.nodes.spatial import SpatialPannerNode

    sr = 48000
    r = np.random.default_rng(31)
    # Measured-like set: 6 directions x 2 ears x 384 taps -> P=3 uniform
    # 128-tap partitions (pads to the mesh's 'part' size with zero kernels).
    m_az = np.array([0.0, 60.0, 120.0, 180.0, 240.0, 300.0])
    m_el = np.array([-30.0, 0.0, 30.0, 0.0, -30.0, 30.0])
    hrir = (r.standard_normal((6, 2, 384)) * 0.05).astype(np.float32)
    hrir_set = {
        "hrir": hrir, "azimuth_deg": m_az, "elevation_deg": m_el,
        "sample_rate": sr,
    }

    def build(mesh):
        ctx = ga.OfflineAudioContext(sample_rate=sr, superblock=4)
        if mesh is not None:
            ctx.set_mesh(mesh)
        ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
        bus = ga.GainNode(ctx)
        bus.gain.value = 0.8
        pan = SpatialPannerNode(ctx)
        pan.load_hrir(hrir_set)
        # Moving source: the per-quantum kernel re-interpolates per block.
        pan.position_x.set_value_at_time(-3.0, 0.0)
        pan.position_x.linear_ramp_to_value_at_time(3.0, 4096 / sr)
        pan.position_z.value = -2.0
        bus.connect(pan).connect(ctx.destination)
        rr = np.random.default_rng(13)
        for v in range(8):
            buf = ga.PlayableAudioBuffer.from_mono_array(
                (rr.standard_normal(4800) * 0.1).astype(np.float32), sr
            )
            src = ga.AudioBufferSourceNode(ctx)
            src.buffer = buf
            src.loop = True
            g = ga.GainNode(ctx)
            g.gain.value = 1.0 / (v + 1)
            src.connect(g).connect(bus)
            src.start(0)
        return ctx

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs >= 8 devices")
    mesh = make_mesh(devs[:8])  # voice x part
    assert mesh.shape["part"] > 1
    ctx, ref_ctx = build(mesh), build(None)
    out, ref = ctx.render(2048), ref_ctx.render(2048)
    part_panner = any(
        isinstance(ctx._compiled.plan[si]["rep"], SpatialPannerNode)
        for si in ctx._compiled.part_sharded
    )
    assert part_panner, "long-HRIR panner did not part-shard"
    assert ctx._compiled.sharded_stages, "voice groups did not shard"
    assert np.abs(out - ref).max() < 1e-5
    # kernel-ring + overlap continuity across steps under sharding
    assert np.abs(ctx.render(2048) - ref_ctx.render(2048)).max() < 1e-5

    # Toggling the mesh off mid-life recompiles to the grouped closure path
    # (ring shrinks Pp-1 -> P-1; migration resets state shape-safely) and
    # keeps rendering the same scene.
    ctx.set_mesh(None)
    out2 = ctx.render(2048)
    assert np.isfinite(out2).all()
    assert not ctx._compiled.part_sharded


def test_part_sharded_hrtf_exact_partition_split(rng):
    """HRIR length an exact multiple of 128 x 'part' (512 taps -> P=4 over
    part=2 or 4): no zero-padding partitions, still matches unsharded."""
    from graphaudio_tpu.nodes.spatial import SpatialPannerNode

    sr = 48000
    r = np.random.default_rng(41)
    hrir_set = {
        "hrir": (r.standard_normal((4, 2, 512)) * 0.05).astype(np.float32),
        "azimuth_deg": np.array([0.0, 90.0, 180.0, 270.0]),
        "elevation_deg": np.zeros(4),
        "sample_rate": sr,
    }

    def build(mesh):
        ctx = ga.OfflineAudioContext(sample_rate=sr, superblock=4)
        if mesh is not None:
            ctx.set_mesh(mesh)
        ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
        rr = np.random.default_rng(5)
        osc = ga.OscillatorNode(ctx)
        osc.frequency.value = 220.0
        pan = SpatialPannerNode(ctx)
        pan.load_hrir(hrir_set, length=512)
        pan.position_x.value = 1.5
        pan.position_z.value = -1.0
        osc.connect(pan).connect(ctx.destination)
        osc.start(0)
        # a voice group so the mesh path engages
        for v in range(8):
            buf = ga.PlayableAudioBuffer.from_mono_array(
                (rr.standard_normal(2400) * 0.05).astype(np.float32), sr
            )
            src = ga.AudioBufferSourceNode(ctx)
            src.buffer = buf
            src.loop = True
            src.connect(ctx.destination)
            src.start(0)
        return ctx

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs >= 8 devices")
    mesh = make_mesh(devs[:8])
    if mesh.shape["part"] not in (2, 4):
        pytest.skip("needs part axis of 2 or 4")
    ctx, ref_ctx = build(mesh), build(None)
    out, ref = ctx.render(2048), ref_ctx.render(2048)
    assert any(
        isinstance(ctx._compiled.plan[si]["rep"], SpatialPannerNode)
        for si in ctx._compiled.part_sharded
    )
    assert np.abs(out - ref).max() < 1e-5


def test_part_only_sharding_engages_shard_map(rng):
    """A part-shardable single with NO shardable voice groups still runs
    inside shard_map (part_sharded must never report a distribution that
    silently fell back to single-device) and matches unsharded."""
    from graphaudio_tpu.nodes.spatial import SpatialPannerNode

    sr = 48000
    r = np.random.default_rng(53)
    hrir_set = {
        "hrir": (r.standard_normal((4, 2, 384)) * 0.05).astype(np.float32),
        "azimuth_deg": np.array([0.0, 90.0, 180.0, 270.0]),
        "elevation_deg": np.zeros(4),
        "sample_rate": sr,
    }

    def build(mesh):
        ctx = ga.OfflineAudioContext(sample_rate=sr, superblock=4)
        if mesh is not None:
            ctx.set_mesh(mesh)
        ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
        osc = ga.OscillatorNode(ctx)  # lone voice: no shardable group
        osc.frequency.value = 440.0
        pan = SpatialPannerNode(ctx)
        pan.load_hrir(hrir_set)
        pan.position_x.value = 2.0
        pan.position_z.value = -1.0
        osc.connect(pan).connect(ctx.destination)
        osc.start(0)
        return ctx

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs >= 8 devices")
    mesh = make_mesh(devs[:8])
    ctx, ref_ctx = build(mesh), build(None)
    out, ref = ctx.render(2048), ref_ctx.render(2048)
    assert ctx._compiled.part_sharded
    assert not ctx._compiled.sharded_stages
    assert ctx._compiled.render_sharded, (
        "part-only plan fell back to single-device execution"
    )
    assert np.abs(out - ref).max() < 1e-5
