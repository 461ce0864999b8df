"""Aux subsystems: stats, graph inspection, checkpoint/resume."""

import numpy as np

import graphaudio_tpu as ga
from graphaudio_tpu.utils import (
    describe_graph,
    graph_to_dot,
    load_context_state,
    save_context_state,
)

SR = 48000


def _make_graph(superblock=2):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    osc = ga.OscillatorNode(ctx)
    osc.frequency.value = 220.0
    flt = ga.BiQuadFilterNode(ctx)
    flt.frequency.value = 800.0
    osc.connect(flt).connect(ctx.destination)
    osc.start(0)
    return ctx


def test_render_stats():
    ctx = _make_graph()
    ctx.render(1024)
    ctx.render(1024)
    s = ctx.stats.summary(SR)
    assert s["render_calls"] == 2
    assert s["frames_rendered"] == 2048
    assert s["quanta_rendered"] == 16
    assert s["compile_count"] >= 1
    assert s["wall_seconds"] > 0
    assert s["xrt"] > 0


def test_render_stats_wall_breakdown():
    """Every render call records its wall composition (prep / dispatch /
    copy-start / transfer / notify) so wall regressions get a name; the
    components account for essentially the whole call (no unexplained
    wall), and the per-chunk lists cover every launched chunk."""
    ctx = _make_graph()
    ctx.render(1024)
    s = ctx.stats
    b = s.last_breakdown
    for key in ("prep_s", "dispatch_s", "copy_start_s", "transfer_s",
                "notify_s", "n_chunks"):
        assert key in b, f"missing breakdown field {key}"
    assert b["n_chunks"] >= 1
    assert len(b["chunk_dispatch_s"]) == b["n_chunks"]
    assert len(b["chunk_transfer_s"]) == b["n_chunks"]
    parts = (b["prep_s"] + b["dispatch_s"] + b["copy_start_s"]
             + b["transfer_s"] + b["notify_s"])
    assert parts <= s.wall_seconds * 1.001
    assert parts >= s.wall_seconds * 0.5, (
        f"breakdown accounts for {parts:.6f}s of {s.wall_seconds:.6f}s wall")
    # the aggregated counters integrate the same components
    assert s.dispatch_seconds > 0 or s.transfer_seconds > 0
    d = s.summary(SR)
    assert d["dispatch_seconds"] >= 0 and d["transfer_seconds"] > 0


def test_describe_graph_and_dot():
    ctx = _make_graph()
    text = describe_graph(ctx)
    assert "Oscillator" in text and "BiQuadFilter" in text
    assert "schedule:" in text and "[sink]" in text
    dot = graph_to_dot(ctx)
    assert dot.startswith("digraph") and "->" in dot


def test_checkpoint_resume_bit_exact(tmp_path, rng):
    # Render 1/3, checkpoint, render rest; vs uninterrupted render.
    def build():
        ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
        data = rng.standard_normal(48000).astype(np.float32) * 0.3
        buf = ga.PlayableAudioBuffer.from_mono_array(data, SR)
        src = ga.AudioBufferSourceNode(ctx)
        src.buffer = buf
        src.loop = True
        flt = ga.BiQuadFilterNode(ctx)
        flt.frequency.value = 1200.0
        dly = ga.DelayNode(ctx, max_delay_time=0.05)
        dly.delay_time.value = 0.01
        src.connect(flt).connect(dly).connect(ctx.destination)
        src.start(0)
        return ctx

    rng_state = rng.bit_generator.state
    ctx_a = build()
    full = ctx_a.render(6144)

    rng.bit_generator.state = rng_state  # identical buffers
    ctx_b = build()
    first = ctx_b.render(2048)
    ckpt = tmp_path / "state.npz"
    save_context_state(ctx_b, ckpt)

    rng.bit_generator.state = rng_state
    ctx_c = build()
    ctx_c.render(512)  # desync on purpose
    load_context_state(ctx_c, ckpt)
    assert abs(ctx_c.current_time - 2048 / SR) < 1e-9
    rest = ctx_c.render(4096)

    got = np.concatenate([first, rest], axis=1)
    assert np.array_equal(got, full)


def test_checkpoint_restores_param_events(tmp_path):
    ctx = _make_graph()
    g = ga.GainNode(ctx)
    # splice the gain between filter and destination
    flt = [n for n in ctx.get_all_nodes() if n.name == "BiQuadFilter"][0]
    flt.disconnect(ctx.destination)
    flt.connect(g).connect(ctx.destination)
    g.gain.set_value_at_time(1.0, 0.0)
    g.gain.linear_ramp_to_value_at_time(0.0, 1.0)
    ctx.render(1024)
    path = tmp_path / "s.npz"
    save_context_state(ctx, path)

    # Mutate, then restore.
    g.gain.value = 0.123
    assert g.gain.event_count() == 0
    load_context_state(ctx, path)
    assert g.gain.event_count() == 2
    assert g.gain.value == 1.0


def test_checkpoint_variant_change_restores_into_fresh_context(tmp_path):
    """Automation events flip kernel-variant selection (static blocked-
    matmul vs time-varying scan) and chain-fusion grouping, so the loader
    must restore the checkpoint's params BEFORE compiling the target
    context — a fresh (un-edited) context then compiles the same layout
    the checkpoint was saved with."""
    def build():
        ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=4,
                                     pipeline_chains=True)
        osc = ga.OscillatorNode(ctx)
        osc.frequency.value = 330.0
        node = osc
        filters = []
        for i in range(3):
            f = ga.BiQuadFilterNode(ctx)
            f.frequency.value = 900.0 * (i + 1)
            filters.append(f)
            node = node.connect(f)
        node.connect(ctx.destination)
        osc.start(0)
        return ctx, filters

    a, fa = build()
    a.render(8000)
    # event on ONE filter: its variant (and the fused chain's grouping)
    # changes relative to the all-static build()
    fa[2].frequency.set_value_at_time(200.0, 0.0)
    a.render(8000)
    path = tmp_path / "variant.npz"
    save_context_state(a, path)
    cont = a.render(5000)

    b, _ = build()
    b._ensure_compiled()  # compiled against the WRONG (event-free) layout
    load_context_state(b, path)
    np.testing.assert_array_equal(b.render(5000), cont)


def test_checkpoint_rejects_mismatched_geometry(tmp_path):
    ctx = _make_graph()
    ctx.render(256)
    ckpt = tmp_path / "state.npz"
    save_context_state(ctx, ckpt)

    # Different superblock -> state shapes differ; must fail loudly.
    ctx2 = _make_graph()
    ctx2.superblock = ctx.superblock * 2
    import pytest

    with pytest.raises(ValueError, match="superblock"):
        load_context_state(ctx2, ckpt)


def test_checkpoint_rejects_different_topology(tmp_path):
    import pytest

    ctx = _make_graph()
    ctx.render(256)
    ckpt = tmp_path / "state.npz"
    save_context_state(ctx, ckpt)

    ctx2 = ga.OfflineAudioContext(sample_rate=SR, superblock=ctx.superblock)
    g = ga.GainNode(ctx2)
    g.connect(ctx2.destination)
    with pytest.raises(ValueError, match="leaves|layout|topology"):
        load_context_state(ctx2, ckpt)


def test_checkpoint_rejects_foreign_file(tmp_path):
    import pytest

    path = tmp_path / "foreign.npz"
    np.savez(
        path,
        __manifest__=np.frombuffer(b'{"format": "something-else"}', dtype=np.uint8),
    )
    ctx = _make_graph()
    with pytest.raises(ValueError, match="format"):
        load_context_state(ctx, path)


def test_static_fingerprint_not_id_based():
    """Cache-key hygiene: fingerprints use the monotonic node_id, so a dead
    node's fingerprint can never alias a new node's (object ids recycle)."""
    ctx = _make_graph()
    a = ga.GainNode(ctx)
    fp_a = a.static_fingerprint()
    assert fp_a[0] == a.node_id
    a.dispose()
    del a
    b = ga.GainNode(ctx)
    assert b.static_fingerprint()[0] != fp_a[0]
