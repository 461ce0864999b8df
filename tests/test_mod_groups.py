"""Voice batching for nodes with MODULATED params.

The reference wires modulation as a hidden mono input per param
(AudioParam.cs:66-70); with per-voice modulators (tremolo LFOs, sidechain
ducking) every voice's modulated node used to demote to its own unbatched
stage — compile time and dispatch scaled linearly with voices. Nodes now
include ``_mod_signature()`` in their group key and the compiler routes each
lane's modulators like per-lane audio inputs (1:1 same-group chains
canonicalize to CHAIN), so a 64-voice LFO->gain scene compiles O(1) stages.

Correctness oracle: the SAME scene built from subclasses whose group_key
returns None — that forces the run_single path, whose modulation semantics
(mixed mono mod, k-rate sampling at block starts, clamp to param range)
are the reference's, independently pinned by tests/test_spatial.py:410 and
the numpy oracle.
"""

import numpy as np
import pytest

import graphaudio_tpu as ga

SR = 48000


class UngroupedGain(ga.GainNode):
    def group_key(self, input_channels):
        return None


class UngroupedOscillator(ga.OscillatorNode):
    def group_key(self, input_channels):
        return None


class UngroupedConstant(ga.ConstantSourceNode):
    def group_key(self, input_channels):
        return None


def _lfo_gain_scene(ctx, voices, gain_cls=ga.GainNode, osc_cls=ga.OscillatorNode,
                    const_cls=ga.ConstantSourceNode, depth=0.25):
    """voices x (const source -> gain; LFO -> gain.gain) -> destination."""
    for v in range(voices):
        src = const_cls(ctx)
        src.offset.value = 0.5 + 0.05 * v
        lfo = osc_cls(ctx)
        lfo.frequency.value = 2.0 + v  # per-voice rate: lanes must differ
        g = gain_cls(ctx)
        g.gain.value = depth
        lfo.connect(g.gain)
        src.connect(g).connect(ctx.destination)
        src.start(0)
        lfo.start(0)


def _stage_kinds(ctx):
    ctx._ensure_compiled()
    return [(kind, len(nodes)) for kind, nodes, _ in ctx._compiled.stages]


def test_lfo_gain_groups_into_constant_stage_count():
    counts = {}
    for voices in (2, 8):
        ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
        _lfo_gain_scene(ctx, voices)
        kinds = _stage_kinds(ctx)
        counts[voices] = len(kinds)
        # consts group + lfos group + gains group + dest
        groups = [k for k in kinds if k[0] == "group"]
        assert len(groups) == 3, kinds
        assert {n for _k, n in groups} == {voices}
    assert counts[2] == counts[8]  # O(1) stages in voice count


def test_lfo_gain_mod_routing_canonicalizes_to_chain():
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    _lfo_gain_scene(ctx, 4)
    ctx._ensure_compiled()
    gain_stages = [
        sp for sp in ctx._compiled.plan
        if sp["kind"] == "group" and sp["group_key"][0] == "gain"
    ]
    assert len(gain_stages) == 1
    (name, a_rate, _exact, modspec), = [
        p for p in gain_stages[0]["params"] if p[0] == "gain"
    ]
    assert a_rate and modspec is not None
    _mn, _mx, routing = modspec
    assert routing[0] == "CHAIN"  # 1:1 per-voice LFO -> param fast path


def test_lfo_gain_matches_ungrouped_singles():
    frames = 16 * 128
    a = ga.OfflineAudioContext(sample_rate=SR, superblock=4)
    _lfo_gain_scene(a, 6)
    b = ga.OfflineAudioContext(sample_rate=SR, superblock=4)
    _lfo_gain_scene(
        b, 6, gain_cls=UngroupedGain, osc_cls=UngroupedOscillator,
        const_cls=UngroupedConstant,
    )
    got = np.asarray(a.render(frames))
    want = np.asarray(b.render(frames))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_mixed_modulated_and_plain_gains_split_groups():
    """Voices with and without a modulator take different group keys (the
    unmodulated path must not grow a clamp it didn't have)."""
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    _lfo_gain_scene(ctx, 3)
    for _ in range(2):  # plain, unmodulated voices
        src = ga.ConstantSourceNode(ctx)
        src.offset.value = 0.25
        g = ga.GainNode(ctx)
        src.connect(g).connect(ctx.destination)
        src.start(0)
    kinds = _stage_kinds(ctx)
    group_sizes = sorted(n for k, n in kinds if k == "group")
    # 5 const sources (all one group), 3 LFOs, 3 modulated gains, 2 plain
    # gains — the gain groups SPLIT on the mod signature.
    assert group_sizes == [2, 3, 3, 5], kinds


def test_fan_in_modulators_group_without_chain():
    """Two LFOs summing into ONE param (and a shared LFO feeding two
    voices) exercise the per-lane routing fallback."""
    frames = 8 * 128

    def build(ctx, gain_cls, osc_cls, const_cls):
        shared = osc_cls(ctx)
        shared.frequency.value = 3.0
        shared.start(0)
        for v in range(3):
            src = const_cls(ctx)
            src.offset.value = 0.4
            g = gain_cls(ctx)
            g.gain.value = 0.5
            shared.connect(g.gain)
            if v == 1:  # second modulator fans into the same param
                extra = osc_cls(ctx)
                extra.frequency.value = 7.0
                extra.connect(g.gain)
                extra.start(0)
            src.connect(g).connect(ctx.destination)
            src.start(0)

    a = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    build(a, ga.GainNode, ga.OscillatorNode, ga.ConstantSourceNode)
    b = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    build(b, UngroupedGain, UngroupedOscillator, UngroupedConstant)
    got = np.asarray(a.render(frames))
    want = np.asarray(b.render(frames))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # voices 0 and 2 share a key (one mod on "gain"); voice 1 also groups
    # with them (mod COUNT is per-lane routing, not part of the key).
    kinds = _stage_kinds(a)
    assert ("group", 3) in kinds, kinds


def test_krate_modulated_spatial_panners_group():
    """17-k-rate-param spatial panners with per-voice LFO->spatialBlend
    group into one stage and match the unbatched path (k-rate mod samples
    the modulator at block starts, AudioParam.cs:150-156)."""
    frames = 8 * 128

    class UngroupedSpatial(ga.SpatialPannerNode):
        def group_key(self, input_channels):
            return None

    def build(ctx, panner_cls, osc_cls, const_cls):
        ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
        for v in range(3):
            src = const_cls(ctx)
            src.offset.value = 0.3
            pan = panner_cls(ctx)
            pan.position_x.value = float(v - 1)
            pan.position_z.value = -2.0
            pan.spatial_blend.value = 0.5
            lfo = osc_cls(ctx)
            lfo.frequency.value = 1.0 + v
            lfo.connect(pan.spatial_blend)
            src.connect(pan).connect(ctx.destination)
            src.start(0)
            lfo.start(0)

    a = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    build(a, ga.SpatialPannerNode, ga.OscillatorNode, ga.ConstantSourceNode)
    b = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    build(b, UngroupedSpatial, UngroupedOscillator, UngroupedConstant)
    got = np.asarray(a.render(frames))
    want = np.asarray(b.render(frames))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)
    kinds = _stage_kinds(a)
    assert ("group", 3) in kinds, kinds


def test_modulated_biquads_group():
    """Per-voice LFO -> biquad frequency: the time-varying kernel variant
    (already mod-aware via _time_varying) now batches too."""
    frames = 8 * 128
    rng = np.random.default_rng(3)
    sig = (rng.standard_normal(frames) * 0.2).astype(np.float32)

    class UngroupedBiquad(ga.BiQuadFilterNode):
        def group_key(self, input_channels):
            return None

    def build(ctx, bq_cls, osc_cls):
        for v in range(3):
            src = ga.AudioBufferSourceNode(ctx)
            src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
            f = bq_cls(ctx)
            f.frequency.value = 800.0 + 200.0 * v
            lfo = osc_cls(ctx)
            lfo.frequency.value = 4.0 + v
            g = ga.GainNode(ctx)  # scale LFO to +-300 Hz
            g.gain.value = 300.0
            lfo.connect(g).connect(f.frequency)
            src.connect(f).connect(ctx.destination)
            src.start(0)
            lfo.start(0)

    a = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    build(a, ga.BiQuadFilterNode, ga.OscillatorNode)
    b = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    build(b, UngroupedBiquad, UngroupedOscillator)
    got = np.asarray(a.render(frames))
    want = np.asarray(b.render(frames))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
    kinds = _stage_kinds(a)
    assert ("group", 3) in kinds, kinds


def test_lfo_gain_under_voice_mesh_matches_unsharded():
    import jax
    from jax.sharding import Mesh

    frames = 8 * 128
    want_ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    _lfo_gain_scene(want_ctx, 8)
    want = np.asarray(want_ctx.render(frames))

    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    _lfo_gain_scene(ctx, 8)
    devs = np.array(jax.devices("cpu")[:8]).reshape(8, 1)
    ctx.set_mesh(Mesh(devs, ("voice", "part")))
    got = np.asarray(ctx.render(frames))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_lfo_gain_matches_numpy_oracle():
    """Independent cross-check: the grouped modulated render against the
    transliterated reference oracle (per-block pull, per-sample walk)."""
    from graphaudio_tpu.testing.oracle import (
        OracleConstantSource,
        OracleContext,
        OracleGain,
        OracleOscillator,
    )

    frames = 8 * 128
    voices = 4

    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    _lfo_gain_scene(ctx, voices)
    got = np.asarray(ctx.render(frames))

    octx = OracleContext(sample_rate=SR)
    for v in range(voices):
        src = OracleConstantSource(octx)
        src.offset.value = 0.5 + 0.05 * v
        lfo = OracleOscillator(octx)
        lfo.frequency.value = 2.0 + v
        g = OracleGain(octx)
        g.gain.value = 0.25
        lfo.connect(g.gain)
        src.connect(g)
        g.connect(octx.destination)
        src.start(0)
        lfo.start(0)
    want = octx.render(frames)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
