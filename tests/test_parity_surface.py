"""Executable parity surface: every API PARITY.md claims must exist.

Round-1 verdict found `process_block`/`process_blocks`/... defined but
orphaned (never attached to AudioContextBase) while PARITY.md claimed them.
This test makes such claims executable: it getattr-checks each claimed
member on the class that PARITY.md maps it to, and exercises the
block-level render APIs end to end (parity: AudioContextBase.cs:52-186).
"""

import numpy as np
import pytest

import graphaudio_tpu as ga
from graphaudio_tpu.core.context import AudioContextBase, OfflineAudioContext
from graphaudio_tpu.core.node import AudioNode
from graphaudio_tpu.core.params import AudioParam
from graphaudio_tpu.core.buffer import PlayableAudioBuffer
from graphaudio_tpu.nodes.sources import (
    AudioBufferSourceNode,
    ConstantSourceNode,
    OscillatorNode,
    ScheduledSourceNode,
)


# Claimed API surface: (class, [member names]). Each row corresponds to a
# PARITY.md claim; keep in sync when PARITY.md grows.
SURFACE = [
    (
        AudioContextBase,
        [
            "current_time",
            "current_block",
            "process_block",
            "process_block_interleaved",
            "process_blocks",
            "render",
            "render_interleaved",
            "post",
            "execute_or_post",
            "get_all_nodes",
            "on_disposing",
            "dispose",
            "set_listener",
        ],
    ),
    (OfflineAudioContext, ["render", "render_seconds"]),
    (
        AudioNode,
        [
            "connect",
            "disconnect",
            "dispose",
            "inputs",
            "outputs",
            "params",
            "node_id",
            "name",
            "create_audio_param",
        ],
    ),
    (
        AudioParam,
        [
            "value",
            "set_value_at_time",
            "linear_ramp_to_value_at_time",
            "exponential_ramp_to_value_at_time",
            "set_target_at_time",
            "cancel_scheduled_values",
            "min_value",
            "max_value",
        ],
    ),
    (
        PlayableAudioBuffer,
        [
            "from_channel_arrays",
            "from_mono_array",
            "from_stereo_arrays",
            "from_interleaved",
            "sample_rate",
            "length",
            "number_of_channels",
            "duration",
            "is_initialized",
        ],
    ),
    (
        ScheduledSourceNode,
        ["start", "stop", "on_ended", "is_playing"],
    ),
    (AudioBufferSourceNode, ["buffer", "loop", "loop_start", "loop_end"]),
    (OscillatorNode, ["type"]),
    (ConstantSourceNode, []),
]


@pytest.mark.parametrize(
    "cls,member",
    [(cls, m) for cls, members in SURFACE for m in members],
    ids=lambda x: x if isinstance(x, str) else x.__name__,
)
def test_member_exists(cls, member):
    if hasattr(cls, member):
        return
    # Instance attributes (ports, params, node_id, ...) are set in __init__;
    # probe a representative live instance.
    ctx = OfflineAudioContext(superblock=1)
    try:
        if cls is AudioNode:
            inst = ga.GainNode(ctx)
        elif cls is AudioParam:
            inst = ga.GainNode(ctx).gain
        elif issubclass(cls, AudioContextBase):
            inst = ctx
        elif cls is PlayableAudioBuffer:
            inst = PlayableAudioBuffer.from_mono_array(
                np.zeros(16, np.float32), 48000
            )
        else:
            inst = cls(ctx)
        assert hasattr(inst, member), (
            f"{cls.__name__}.{member} missing (PARITY.md claims it)"
        )
    finally:
        ctx.dispose()


def _sine_context():
    ctx = OfflineAudioContext(sample_rate=48000, superblock=4)
    osc = OscillatorNode(ctx)
    osc.connect(ctx.destination)
    osc.start(0)
    return ctx


def test_process_block_returns_one_quantum():
    ctx = _sine_context()
    out = ctx.process_block()
    assert out.shape == (2, 128)
    assert out.dtype == np.float32
    assert np.any(out != 0.0)
    # Block clock advanced by exactly one quantum's worth of frames served.
    assert ctx.process_block().shape == (2, 128)


def test_process_block_interleaved_layout():
    ctx = _sine_context()
    planar_ctx = _sine_context()
    inter = ctx.process_block_interleaved()
    planar = planar_ctx.process_block()
    assert inter.shape == (2 * 128,)
    np.testing.assert_array_equal(inter.reshape(128, 2).T, planar)


def test_process_blocks_batch():
    ctx = _sine_context()
    out = ctx.process_blocks(7)
    assert out.shape == (2, 7 * 128)
    # Equal to seven single blocks rendered back to back.
    ctx2 = _sine_context()
    seq = np.concatenate([ctx2.process_block() for _ in range(7)], axis=1)
    np.testing.assert_allclose(out, seq, atol=0.0)


def test_render_interleaved_matches_render():
    ctx = _sine_context()
    ctx2 = _sine_context()
    inter = ctx.render_interleaved(300)
    planar = ctx2.render(300)
    assert inter.shape == (300 * 2,)
    np.testing.assert_array_equal(inter.reshape(300, 2).T, planar)


def test_render_pcm16_matches_quantized_f32():
    """Device-side int16 packing == round(clip(f32)*32767), interleaved."""
    ctx = _sine_context()
    ctx2 = _sine_context()
    pcm = ctx.render_pcm16(300)
    planar = ctx2.render(300)
    assert pcm.dtype == np.int16
    assert pcm.shape == (300 * 2,)
    expect = np.round(np.clip(planar, -1.0, 1.0) * np.float32(32767.0))
    np.testing.assert_array_equal(
        pcm.reshape(300, 2).T, expect.astype(np.int16)
    )


def test_render_pcm16_carry_roundtrip():
    """Leftover pcm16 frames carry dequantized and re-quantize identically:
    two pcm16 calls splitting a superblock == one call for the total."""
    ctx = _sine_context()
    ctx2 = _sine_context()
    a = ctx.render_pcm16(100)
    b = ctx.render_pcm16(200)
    whole = ctx2.render_pcm16(300)
    np.testing.assert_array_equal(np.concatenate([a, b]), whole)


def test_render_chunk_schedule_matches_single_chunk(monkeypatch):
    """GA_RENDER_CHUNK schedules ("1,2": head chunk of 1 step, then 2-step
    chunks) split the launch without changing a single sample — both wire
    formats."""
    frames = 7 * 4 * 128  # 7 superblock steps -> chunks of 1,2,2,2
    ref = _sine_context().render(frames)
    ref16 = _sine_context().render_pcm16(frames)
    monkeypatch.setenv("GA_RENDER_CHUNK", "1,2")
    ctx = _sine_context()
    np.testing.assert_array_equal(ctx.render(frames), ref)
    ctx16 = _sine_context()
    np.testing.assert_array_equal(ctx16.render_pcm16(frames), ref16)
    assert ctx.stats.last_breakdown["n_chunks"] == 4
    assert ctx.stats.last_breakdown["chunk_dispatch_s"][0] >= 0.0


def test_render_chunk_schedule_rejects_nonpositive(monkeypatch):
    """A zero/negative GA_RENDER_CHUNK entry raises instead of spinning the
    launch loop forever on an empty chunk."""
    import pytest

    for bad in ("34,0", "-1", "0"):
        monkeypatch.setenv("GA_RENDER_CHUNK", bad)
        ctx = _sine_context()
        with pytest.raises(ValueError, match="GA_RENDER_CHUNK"):
            ctx.render(4 * 128)


def test_render_chunk_schedule_rejects_malformed(monkeypatch):
    """Unparsable GA_RENDER_CHUNK entries get the descriptive error, not a
    raw int() ValueError."""
    import pytest

    for bad in ("64,", "5, 34x", "abc"):
        monkeypatch.setenv("GA_RENDER_CHUNK", bad)
        ctx = _sine_context()
        with pytest.raises(ValueError, match="GA_RENDER_CHUNK"):
            ctx.render(4 * 128)


def test_context_chunk_schedule_attribute(monkeypatch):
    """``ctx.chunk_schedule`` (int / list / string) overrides the env var
    without changing a single sample; invalid values raise with the
    attribute's name."""
    import pytest

    frames = 7 * 4 * 128
    ref = _sine_context().render(frames)
    monkeypatch.setenv("GA_RENDER_CHUNK", "1000")  # would be one big chunk
    for sched, n_chunks in ((2, 4), ([1, 2], 4), ("1,2", 4)):
        ctx = _sine_context()
        ctx.chunk_schedule = sched
        np.testing.assert_array_equal(ctx.render(frames), ref)
        assert ctx.stats.last_breakdown["n_chunks"] == n_chunks
    ctx = _sine_context()
    ctx.chunk_schedule = "0"
    with pytest.raises(ValueError, match="chunk_schedule"):
        ctx.render(4 * 128)
    ctx = _sine_context()
    ctx.chunk_schedule = "nope"
    with pytest.raises(ValueError, match="chunk_schedule"):
        ctx.render(4 * 128)


def test_context_chunk_schedule_generator_and_bad_types(monkeypatch):
    """A one-shot iterable is materialized on first use (the SECOND render
    must not see an exhausted generator), and non-int/str/iterable values
    raise the documented ValueError, not a raw TypeError."""
    import pytest

    frames = 7 * 4 * 128
    ref_ctx = _sine_context()
    ref1, ref2 = ref_ctx.render(frames), ref_ctx.render(frames)
    monkeypatch.setenv("GA_RENDER_CHUNK", "1000")
    ctx = _sine_context()
    ctx.chunk_schedule = (c for c in (1, 2))
    np.testing.assert_array_equal(ctx.render(frames), ref1)
    assert ctx.chunk_schedule == "1,2"  # normalized, reusable
    np.testing.assert_array_equal(ctx.render(frames), ref2)
    assert ctx.stats.last_breakdown["n_chunks"] == 4
    for bad in (2.5, object()):
        ctx = _sine_context()
        ctx.chunk_schedule = bad
        with pytest.raises(ValueError, match="chunk_schedule"):
            ctx.render(4 * 128)


def test_render_pcm16_after_f32_carry():
    """f32-carried frames quantize on host with the same formula."""
    ctx = _sine_context()
    ctx2 = _sine_context()
    f32_part = ctx.render(100)
    pcm_rest = ctx.render_pcm16(200)
    whole = ctx2.render_pcm16(300)
    expect_head = np.round(
        np.clip(f32_part, -1.0, 1.0) * np.float32(32767.0)
    ).astype(np.int16)
    np.testing.assert_array_equal(
        np.concatenate([np.ascontiguousarray(expect_head.T).reshape(-1), pcm_rest]),
        whole,
    )


def test_block_apis_on_realtime_context():
    """The block APIs live on the BASE context, so realtime contexts have
    them too (the reference defines ProcessBlock on AudioContextBase)."""
    from graphaudio_tpu.realtime.context import RealtimeAudioContext

    assert hasattr(RealtimeAudioContext, "process_block")
    assert hasattr(RealtimeAudioContext, "process_block_interleaved")
    assert hasattr(RealtimeAudioContext, "process_blocks")
