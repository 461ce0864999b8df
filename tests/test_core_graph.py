"""Graph construction, mixing rules, channel resolution, cycle detection."""

import numpy as np
import pytest

import graphaudio_tpu as ga


def _const_graph(ctx, value, channels=1):
    """A constant source at a given channel count via merger."""
    src = ga.ConstantSourceNode(ctx)
    src.offset.value = value
    src.start(0)
    if channels == 1:
        return src
    merger = ga.ChannelMergerNode(ctx, channels)
    for i in range(channels):
        src.connect(merger, input=i)
    return merger


def test_fan_in_sums():
    ctx = ga.OfflineAudioContext(superblock=1)
    a = _const_graph(ctx, 0.25)
    b = _const_graph(ctx, 0.5)
    a.connect(ctx.destination)
    b.connect(ctx.destination)
    out = ctx.render(128)
    assert out.shape == (2, 128)  # destination default stereo, mono upmixed
    assert np.allclose(out, 0.75)


def test_mono_to_stereo_broadcast():
    ctx = ga.OfflineAudioContext(superblock=1)
    a = _const_graph(ctx, 0.3)
    a.connect(ctx.destination)
    out = ctx.render(128)
    assert np.allclose(out[0], 0.3) and np.allclose(out[1], 0.3)


def test_stereo_to_mono_downmix():
    # N -> 1 uses sum * 1/sqrt(N) (AudioNodeInput.cs:214-228).
    ctx = ga.OfflineAudioContext(superblock=1)
    st = _const_graph(ctx, 0.5, channels=2)
    ctx.destination.set_channel_count(1)
    ctx.destination.inputs[0].set_channel_count_mode(ga.ChannelCountMode.EXPLICIT)
    st.connect(ctx.destination)
    out = ctx.render(128)
    assert out.shape[0] == 1
    assert np.allclose(out[0], 2 * 0.5 / np.sqrt(2.0), atol=1e-6)


def test_discrete_fallback_min_channels():
    # 3ch -> 2ch: first 2 channels added (AudioNodeInput.cs:229-243).
    ctx = ga.OfflineAudioContext(superblock=1)
    tri = _const_graph(ctx, 0.4, channels=3)
    ctx.destination.set_channel_count(2)
    ctx.destination.inputs[0].set_channel_count_mode(ga.ChannelCountMode.EXPLICIT)
    tri.connect(ctx.destination)
    out = ctx.render(128)
    assert out.shape[0] == 2
    assert np.allclose(out, 0.4)


def test_max_mode_takes_widest_source():
    ctx = ga.OfflineAudioContext(superblock=1)
    four = _const_graph(ctx, 0.2, channels=4)
    four.connect(ctx.destination)  # destination Max mode, count 2
    out = ctx.render(128)
    assert out.shape[0] == 4


def test_cycle_detection():
    ctx = ga.OfflineAudioContext(superblock=1)
    g1 = ga.GainNode(ctx)
    g2 = ga.GainNode(ctx)
    g1.connect(g2)
    g2.connect(g1)
    g2.connect(ctx.destination)
    with pytest.raises(RuntimeError, match="cycle"):
        ctx.render(128)


def test_self_connection_rejected():
    ctx = ga.OfflineAudioContext(superblock=1)
    g = ga.GainNode(ctx)
    with pytest.raises(ValueError):
        g.connect(g)


def test_connect_returns_destination_for_chaining():
    ctx = ga.OfflineAudioContext(superblock=1)
    a, b, c = ga.GainNode(ctx), ga.GainNode(ctx), ga.GainNode(ctx)
    assert a.connect(b) is b
    assert a.connect(b).connect(c) is c


def test_disconnect_silences():
    ctx = ga.OfflineAudioContext(superblock=1)
    src = _const_graph(ctx, 1.0)
    src.connect(ctx.destination)
    out = ctx.render(128)
    assert np.allclose(out, 1.0)
    src.disconnect(ctx.destination)
    out = ctx.render(128)
    assert np.allclose(out, 0.0)


def test_unconnected_graph_renders_silence():
    ctx = ga.OfflineAudioContext(superblock=1)
    out = ctx.render(256)
    assert out.shape == (2, 256)
    assert np.allclose(out, 0.0)


def test_get_all_nodes():
    ctx = ga.OfflineAudioContext(superblock=1)
    src = ga.ConstantSourceNode(ctx)
    g = ga.GainNode(ctx)
    src.connect(g).connect(ctx.destination)
    nodes = ctx.get_all_nodes()
    ids = {n.node_id for n in nodes}
    assert {src.node_id, g.node_id, ctx.destination.node_id} <= ids


def test_partial_render_carry():
    # Arbitrary frame counts are served exactly, with superblock remainders
    # carried (parity: OfflineAudioContext partial-block cache, :55-101).
    ctx = ga.OfflineAudioContext(superblock=2)
    sig = np.arange(1000, dtype=np.float32) / 1000.0
    buf = ga.PlayableAudioBuffer.from_mono_array(sig, ctx.sample_rate)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0)
    a = ctx.render(100)
    b = ctx.render(300)
    c = ctx.render(57)
    got = np.concatenate([a[0], b[0], c[0]])
    assert np.allclose(got, sig[:457])


def test_current_time_advances():
    ctx = ga.OfflineAudioContext(superblock=1)
    assert ctx.current_time == 0.0
    ctx.render(48000)
    assert abs(ctx.current_time - 1.0) < 1e-9
    assert ctx.current_block == 375


def test_gain_param_modulation_connect_api():
    ctx = ga.OfflineAudioContext(superblock=1)
    g = ga.GainNode(ctx)
    mod = ga.ConstantSourceNode(ctx)
    # connecting via node.connect(param)
    mod.connect(g.gain)
    assert mod.outputs[0].param_connections == [g.gain]
    mod.disconnect(g.gain)
    assert mod.outputs[0].param_connections == []


def test_deep_chain_compiles_without_recursion_error():
    """A ~1500-node serial cascade must topo-sort iteratively — recursive
    DFS dies at Python's recursion limit (regression)."""
    ctx = ga.OfflineAudioContext(superblock=1)
    src = ga.ConstantSourceNode(ctx)
    src.offset.value = 0.25
    node = src
    for _ in range(1500):
        g = ga.GainNode(ctx)
        node = node.connect(g)
    node.connect(ctx.destination)
    src.start(0)
    ctx._ensure_compiled()
    assert len(ctx._compiled.topo) == 1502


def test_connect_param_with_bad_output_index_raises():
    ctx = ga.OfflineAudioContext(superblock=1)
    g = ga.GainNode(ctx)
    mod = ga.ConstantSourceNode(ctx)
    import pytest
    with pytest.raises(IndexError):
        mod.connect(g.gain, output=-1)
    with pytest.raises(IndexError):
        mod.disconnect(g.gain, output=5)


def test_set_listener_posts_and_applies():
    ctx = ga.OfflineAudioContext(superblock=1)
    ctx.set_listener([1.0, 2.0, 3.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0])
    assert np.allclose(ctx._listener["listener_pos"], [1, 2, 3])
    src = ga.ConstantSourceNode(ctx)
    src.connect(ctx.destination)
    src.start(0)
    ctx.render(128)
    ctx.set_listener([4.0, 5.0, 6.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0])
    assert np.allclose(
        np.asarray(ctx._states["__globals__"]["listener_pos"]), [4, 5, 6]
    )
