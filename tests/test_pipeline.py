"""Pipelined chain fusion (CompiledGraph._fuse_chains): parity + semantics.

A cascade of same-type nodes fuses into ONE vmapped 'pipe' stage whose
lane i processes superblock (step - i), with in-flight audio in a carried
register bank and a drain epilogue per render call. These tests pin the
contract: audio is EXACTLY the unfused graph's, per render call, across
call boundaries, under automation, and through checkpoint/resume.
"""

import numpy as np
import pytest

import graphaudio_tpu as ga

SR = 48000


def _chain_ctx(pipeline, n_filters=4, superblock=4, gains=False):
    ctx = ga.OfflineAudioContext(
        sample_rate=SR, superblock=superblock, pipeline_chains=pipeline
    )
    rng = np.random.default_rng(7)
    src = ga.AudioBufferSourceNode(ctx)
    l = (rng.standard_normal(SR) * 0.3).astype(np.float32)
    r = (rng.standard_normal(SR) * 0.3).astype(np.float32)
    src.buffer = ga.PlayableAudioBuffer.from_stereo_arrays(l, r, SR)
    src.loop = True
    node = src
    for i in range(n_filters):
        if gains:
            g = ga.GainNode(ctx)
            g.gain.value = 0.9
            g.gain.linear_ramp_to_value_at_time(0.5 + 0.1 * i, 0.4)
            node = node.connect(g)
        else:
            bq = ga.BiQuadFilterNode(ctx)
            bq.frequency.value = 400.0 * (i + 1)
            bq.frequency.linear_ramp_to_value_at_time(600.0 * (i + 1), 0.5)
            node = node.connect(bq)
    node.connect(ctx.destination)
    src.start(0)
    return ctx


def test_biquad_chain_fuses_and_matches_exactly():
    a = _chain_ctx(False)
    b = _chain_ctx(True)
    b._ensure_compiled()
    assert b._compiled.pipe_delay == 3
    kinds = [sp["kind"] for sp in b._compiled.plan]
    assert "pipe" in kinds and kinds.count("group") == 1  # source only
    # Parity across several calls incl. a non-superblock-multiple length.
    for frames in (20000, 13000, 700):
        oa = a.render(frames)
        ob = b.render(frames)
        np.testing.assert_array_equal(oa, ob)


def test_gain_chain_fuses_and_matches_exactly():
    a = _chain_ctx(False, gains=True)
    b = _chain_ctx(True, gains=True)
    b._ensure_compiled()
    assert b._compiled.pipe_delay == 3
    np.testing.assert_array_equal(a.render(20000), b.render(20000))


def test_mixed_level_fanin_refuses_fusion():
    """A consumer mixing a direct source tap with a chained path would see
    misaligned superblocks — fusion must refuse and render unfused."""
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=4,
                                 pipeline_chains=True)
    osc = ga.OscillatorNode(ctx)
    osc.frequency.value = 220.0
    b1 = ga.BiQuadFilterNode(ctx)
    b2 = ga.BiQuadFilterNode(ctx)
    osc.connect(b1).connect(b2).connect(ctx.destination)
    osc.connect(ctx.destination)  # direct tap at level 0
    osc.start(0)
    ctx._ensure_compiled()
    assert ctx._compiled.pipe_delay == 0
    assert all(sp["kind"] != "pipe" for sp in ctx._compiled.plan)
    out = ctx.render(8000)
    assert np.isfinite(out).all() and float(np.abs(out).max()) > 0


def test_side_tap_inside_chain_refuses_fusion():
    """An intermediate chain node with a second consumer cannot fuse."""
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=4,
                                 pipeline_chains=True)
    osc = ga.OscillatorNode(ctx)
    b1 = ga.BiQuadFilterNode(ctx)
    b2 = ga.BiQuadFilterNode(ctx)
    g = ga.GainNode(ctx)
    g.gain.value = 0.2
    osc.connect(b1).connect(b2).connect(ctx.destination)
    b1.connect(g).connect(ctx.destination)  # side tap off the middle
    osc.start(0)
    ctx._ensure_compiled()
    assert ctx._compiled.pipe_delay == 0


def test_pipeline_respects_block_api():
    """process_block streams one quantum per call; the drain epilogue keeps
    output exact (at D extra steps' cost), so results match unfused."""
    a = _chain_ctx(False, superblock=2)
    b = _chain_ctx(True, superblock=2)
    for _ in range(5):
        np.testing.assert_array_equal(a.process_block(), b.process_block())


def test_pipeline_checkpoint_roundtrip(tmp_path):
    from graphaudio_tpu.utils import load_context_state, save_context_state

    b = _chain_ctx(True)
    b.render(9000)
    path = tmp_path / "pipe.gacp"
    save_context_state(b, path)
    cont = b.render(6000)

    b2 = _chain_ctx(True)
    b2._ensure_compiled()
    load_context_state(b2, path)
    np.testing.assert_array_equal(b2.render(6000), cont)


def test_pipeline_topology_edit_refuses_stale_registers():
    """Editing the chain mid-stream recompiles; the (new) pipeline registers
    restart silent — output stays finite and converges back to the unfused
    render after the pipeline refills."""
    a = _chain_ctx(False)
    b = _chain_ctx(True)
    a.render(8000)
    b.render(8000)
    # identical edit on both: retune one filter
    for ctx in (a, b):
        for node in ctx._nodes.values():
            if isinstance(node, ga.BiQuadFilterNode):
                node.frequency.value = 1234.0
                break
    oa = a.render(8000)
    ob = b.render(8000)
    # same graph, same states -> identical (param edits don't rebuild
    # topology, so registers are preserved)
    np.testing.assert_array_equal(oa, ob)


def test_pipeline_non_head_param_edit_between_calls_exact():
    """Editing a NON-head chain member's param between render calls must
    behave exactly as the unfused graph: the drained pipeline state was
    committed under the OLD params, and only new superblocks see the new
    ones. (Regression: the earlier discard-and-re-derive design re-ran the
    in-flight superblocks with the NEW params — measured 3.9e-3 divergence
    from the unfused render on this exact scenario.)"""
    a = _chain_ctx(False)
    b = _chain_ctx(True)
    np.testing.assert_array_equal(a.render(9000), b.render(9000))
    for ctx in (a, b):
        filters = [n for n in ctx._nodes.values()
                   if isinstance(n, ga.BiQuadFilterNode)]
        # the LAST chain member: the deepest pipeline lane
        filters[-1].frequency.set_value_at_time(777.0, 0.0)
        filters[2].q.linear_ramp_to_value_at_time(3.0, 0.4)
    np.testing.assert_array_equal(a.render(9000), b.render(9000))
    # and again after another edit, across a non-aligned boundary
    for ctx in (a, b):
        filters = [n for n in ctx._nodes.values()
                   if isinstance(n, ga.BiQuadFilterNode)]
        filters[1].frequency.set_value_at_time(350.0, 0.0)
    np.testing.assert_array_equal(a.render(700), b.render(700))
    np.testing.assert_array_equal(a.render(5000), b.render(5000))


def test_pipeline_value_setter_edit_between_calls_close():
    """`param.value = x` CLEARS the event list; the unfused all-static
    biquad then switches to the constant-coefficient blocked-matmul kernel
    while the pipe (whose other lanes stay automated) keeps the
    time-varying scan — two algebraically equal algorithms that agree to
    f32 rounding, not bit-exactly. The SEMANTICS (which superblocks see
    the new value) still match exactly; amplitudes agree to ~1e-6."""
    a = _chain_ctx(False)
    b = _chain_ctx(True)
    np.testing.assert_array_equal(a.render(9000), b.render(9000))
    for ctx in (a, b):
        filters = [n for n in ctx._nodes.values()
                   if isinstance(n, ga.BiQuadFilterNode)]
        filters[-1].frequency.value = 777.0
    oa, ob = a.render(9000), b.render(9000)
    np.testing.assert_allclose(oa, ob, atol=1e-6)


def test_pipeline_off_for_realtime_contexts():
    from graphaudio_tpu.realtime import RealtimeAudioContext

    ctx = RealtimeAudioContext(sample_rate=SR, superblock=2)
    assert not getattr(ctx, "pipeline_chains", False)
    ctx.dispose()


def test_mixed_type_biquad_chain_fuses_fully():
    """Filter TYPE is kernel data (a per-lane one-hot selecting RBJ
    coefficients), so a lowpass->peaking->peaking->highpass cascade — the
    BASELINE config-3 shape — fuses into ONE pipelined stage instead of
    splitting at every type change."""
    def build(pipeline):
        ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=4,
                                     pipeline_chains=pipeline)
        rng = np.random.default_rng(11)
        src = ga.AudioBufferSourceNode(ctx)
        sig = (rng.standard_normal(SR) * 0.3).astype(np.float32)
        src.buffer = ga.PlayableAudioBuffer.from_stereo_arrays(
            sig, sig[::-1].copy(), SR)
        src.loop = True
        node = src
        for i, t in enumerate([ga.FilterType.LOWPASS, ga.FilterType.PEAKING,
                               ga.FilterType.PEAKING, ga.FilterType.HIGHPASS]):
            f = ga.BiQuadFilterNode(ctx, type=t)
            f.frequency.value = 400.0 * (i + 1)
            f.frequency.linear_ramp_to_value_at_time(600.0 * (i + 1), 0.5)
            node = node.connect(f)
        node.connect(ctx.destination)
        src.start(0)
        return ctx

    a = build(False)
    b = build(True)
    b._ensure_compiled()
    assert b._compiled.pipe_delay == 3  # the WHOLE mixed chain is one pipe
    # The where-chain selection is arithmetic-exact per lane, but the
    # dynamic kernel compiles with different FMA choices than the static
    # single-branch kernels of the unfused graph — agreement is at f32
    # rounding level, not bit-exact (same-type chains stay bit-exact via
    # the static kernel; see BiQuadFilterNode.chain_key).
    np.testing.assert_allclose(a.render(20000), b.render(20000), atol=2e-5)
    np.testing.assert_allclose(a.render(700), b.render(700), atol=2e-5)


def test_biquad_type_edit_resets_selector_in_fused_chain():
    """Changing a fused chain member's type recompiles AND re-derives the
    per-lane type selector (config-derived state must not migrate)."""
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=4,
                                 pipeline_chains=True)
    osc = ga.OscillatorNode(ctx)
    osc.frequency.value = 440.0
    f1 = ga.BiQuadFilterNode(ctx, type=ga.FilterType.LOWPASS)
    f2 = ga.BiQuadFilterNode(ctx, type=ga.FilterType.LOWPASS)
    for f in (f1, f2):
        f.frequency.value = 300.0  # well below 440 -> strong attenuation
    osc.connect(f1).connect(f2).connect(ctx.destination)
    osc.start(0)
    low = ctx.render(8000)
    f2.type = ga.FilterType.HIGHPASS  # config edit on a fused lane
    high = ctx.render(8000)
    # identical unfused graph after the same edit
    ctx2 = ga.OfflineAudioContext(sample_rate=SR, superblock=4,
                                  pipeline_chains=False)
    o2 = ga.OscillatorNode(ctx2)
    o2.frequency.value = 440.0
    g1 = ga.BiQuadFilterNode(ctx2, type=ga.FilterType.LOWPASS)
    g2 = ga.BiQuadFilterNode(ctx2, type=ga.FilterType.LOWPASS)
    for f in (g1, g2):
        f.frequency.value = 300.0
    o2.connect(g1).connect(g2).connect(ctx2.destination)
    o2.start(0)
    ctx2.render(8000)
    g2.type = ga.FilterType.HIGHPASS
    want = ctx2.render(8000)
    np.testing.assert_allclose(high, want, atol=1e-5)
    # and the edit actually changed the output (selector not stale)
    assert np.abs(high - low).max() > 0.05


def test_pipeline_composes_with_mesh_eq_cascade():
    """Config-3-style EQ cascade under set_mesh: the fused single-stage
    pipe step is KEPT (pipe lanes are pipeline stages, not voices — they
    replicate across the mesh) and audio matches the unsharded render."""
    import jax
    from jax.sharding import Mesh

    want_ctx = _chain_ctx(True, n_filters=6)
    want = np.asarray(want_ctx.render(16 * 128))

    ctx = _chain_ctx(True, n_filters=6)
    devs = np.array(jax.devices("cpu")[:8]).reshape(4, 2)
    ctx.set_mesh(Mesh(devs, ("voice", "part")))
    got = np.asarray(ctx.render(16 * 128))
    assert ctx._compiled.pipe_delay == 5
    kinds = [sp["kind"] for sp in ctx._compiled.plan]
    assert kinds.count("pipe") == 1, kinds
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)


def test_pipeline_coexists_with_voice_sharded_groups():
    """A voice-sharded mix bus FEEDING a fused EQ chain under one mesh:
    the groups shard over 'voice' (psum fan-in), the pipe replicates, and
    the render matches unsharded."""
    import jax
    from jax.sharding import Mesh

    def build(mesh):
        ctx = ga.OfflineAudioContext(
            sample_rate=SR, superblock=4, pipeline_chains=True
        )
        if mesh is not None:
            ctx.set_mesh(mesh)
        rng = np.random.default_rng(17)
        bus = ga.GainNode(ctx)
        bus.gain.value = 0.25
        node = bus
        for i in range(4):  # serial EQ on the master bus -> fuses
            bq = ga.BiQuadFilterNode(ctx)
            bq.frequency.value = 500.0 * (i + 1)
            node = node.connect(bq)
        node.connect(ctx.destination)
        for v in range(8):  # voice groups -> shard over 'voice'
            src = ga.AudioBufferSourceNode(ctx)
            src.buffer = ga.PlayableAudioBuffer.from_mono_array(
                (rng.standard_normal(4096) * 0.2).astype(np.float32), SR
            )
            src.loop = True
            g = ga.GainNode(ctx)
            g.gain.value = 0.5 + 0.05 * v
            src.connect(g).connect(bus)
            src.start(0)
        return ctx

    want = np.asarray(build(None).render(12 * 128))
    devs = np.array(jax.devices("cpu")[:8]).reshape(8, 1)
    ctx = build(Mesh(devs, ("voice", "part")))
    got = np.asarray(ctx.render(12 * 128))
    kinds = [sp["kind"] for sp in ctx._compiled.plan]
    assert kinds.count("pipe") == 1, kinds
    assert ctx._compiled.sharded_stages, "voice groups did not shard"
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
    # continuity across calls (register bank + filter-state carry)
    ref = build(None)
    ref.render(12 * 128)
    want2 = np.asarray(ref.render(8 * 128))
    got2 = np.asarray(ctx.render(8 * 128))
    np.testing.assert_allclose(got2, want2, atol=1e-5, rtol=0)
