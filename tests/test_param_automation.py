"""AudioParam automation-curve semantics.

Golden behavior from GraphAudio.Core/AudioParam.cs:168-247 re-derived
analytically (boundary rules, interpolation formulas, SetTarget decay).
"""

import numpy as np
import jax.numpy as jnp

import graphaudio_tpu as ga
from graphaudio_tpu.ops.param_eval import eval_intrinsic


def _eval(param, times, capacity=8):
    enc = param.encode(capacity)
    return np.asarray(eval_intrinsic(enc, jnp.asarray(times, jnp.float64)))


def _mkparam(default=1.0, mn=-1e9, mx=1e9):
    ctx = ga.OfflineAudioContext()
    g = ga.GainNode(ctx)
    return g.create_audio_param("p", default, min_value=mn, max_value=mx)


def test_no_events_returns_value():
    p = _mkparam(default=0.25)
    assert np.allclose(_eval(p, [0.0, 1.0, 2.0]), 0.25)
    p.value = 0.75
    assert np.allclose(_eval(p, [0.5]), 0.75)


def test_set_value_at_time():
    p = _mkparam(default=1.0)
    p.set_value_at_time(2.0, 1.0)
    p.set_value_at_time(3.0, 2.0)
    t = [0.0, 0.5, 1.0, 1.5, 2.0, 5.0]
    expect = [1.0, 1.0, 2.0, 2.0, 3.0, 3.0]
    assert np.allclose(_eval(p, t), expect)


def test_linear_ramp():
    p = _mkparam(default=0.0)
    p.set_value_at_time(0.0, 1.0)
    p.linear_ramp_to_value_at_time(1.0, 2.0)
    t = [0.5, 1.0, 1.25, 1.5, 1.75, 2.0, 3.0]
    expect = [0.0, 0.0, 0.25, 0.5, 0.75, 1.0, 1.0]
    assert np.allclose(_eval(p, t), expect, atol=1e-7)


def test_linear_ramp_from_base_value():
    # Ramp as first event: before it, the base value holds; the ramp
    # interpolates only from the previous EVENT, so with no previous event the
    # reference returns the boundary value until the ramp time passes.
    p = _mkparam(default=0.5)
    p.linear_ramp_to_value_at_time(1.0, 2.0)
    t = [0.0, 1.0, 1.999, 2.0, 3.0]
    # idx==0 for t < 2.0 -> boundary (0.5); at/after 2.0 -> event value.
    expect = [0.5, 0.5, 0.5, 1.0, 1.0]
    assert np.allclose(_eval(p, t), expect)


def test_exponential_ramp():
    p = _mkparam(default=0.0)
    p.set_value_at_time(1.0, 1.0)
    p.exponential_ramp_to_value_at_time(4.0, 3.0)
    # v(t) = v0 * (v1/v0)^u, u=(t-t0)/(t1-t0)
    t = np.array([1.0, 2.0, 3.0, 4.0])
    expect = [1.0, 2.0, 4.0, 4.0]
    assert np.allclose(_eval(p, t), expect, rtol=1e-6)


def test_exponential_ramp_nonpositive_falls_back_to_linear():
    p = _mkparam(default=0.0)
    p.set_value_at_time(0.0, 1.0)  # v0 = 0 -> linear fallback
    p.exponential_ramp_to_value_at_time(2.0, 3.0)
    assert np.allclose(_eval(p, [2.0]), 1.0, atol=1e-7)


def test_exponential_ramp_rejects_nonpositive_target():
    p = _mkparam(default=0.0)
    try:
        p.exponential_ramp_to_value_at_time(0.0, 1.0)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_set_target():
    p = _mkparam(default=1.0)
    p.set_target_at_time(0.0, 1.0, 0.5)
    t = np.array([0.5, 1.0, 1.5, 2.0, 10.0])
    expect = np.where(t <= 1.0, 1.0, 0.0 + (1.0 - 0.0) * np.exp(-(t - 1.0) / 0.5))
    assert np.allclose(_eval(p, t), expect, rtol=1e-6)


def test_set_target_time_constant_floor():
    # Time constants below 0.001 are clamped (AudioParam.cs:245).
    p = _mkparam(default=1.0)
    p.set_target_at_time(0.0, 0.0, 0.0)
    expect = np.exp(-1.0 / 0.001)
    assert np.allclose(_eval(p, [1.0]), expect, atol=1e-12)


def test_set_target_baseline_from_previous_event():
    # Boundary value before SetTarget comes from the last non-SetTarget event.
    p = _mkparam(default=0.0)
    p.set_value_at_time(2.0, 1.0)
    p.set_target_at_time(1.0, 2.0, 1.0)
    t = np.array([3.0])
    expect = 1.0 + (2.0 - 1.0) * np.exp(-1.0)
    assert np.allclose(_eval(p, t), expect, rtol=1e-6)


def test_event_after_set_target_holds():
    # SetValue after a SetTarget truncates the decay.
    p = _mkparam(default=1.0)
    p.set_target_at_time(0.0, 0.0, 1.0)
    p.set_value_at_time(0.5, 2.0)
    assert np.allclose(_eval(p, [3.0]), 0.5)
    # during decay
    assert np.allclose(_eval(p, [1.0]), np.exp(-1.0), rtol=1e-6)


def test_cancel_scheduled_values():
    p = _mkparam(default=0.0)
    p.set_value_at_time(1.0, 1.0)
    p.set_value_at_time(2.0, 2.0)
    p.set_value_at_time(3.0, 3.0)
    p.cancel_scheduled_values(2.0)
    assert p.event_count() == 1
    assert np.allclose(_eval(p, [5.0]), 1.0)


def test_value_set_cancels_events():
    p = _mkparam(default=0.0)
    p.set_value_at_time(1.0, 1.0)
    p.value = 0.5
    assert p.event_count() == 0
    assert np.allclose(_eval(p, [5.0]), 0.5)


def test_insert_clamps_to_range():
    p = _mkparam(default=0.0, mn=0.0, mx=1.0)
    p.set_value_at_time(5.0, 1.0)  # clamped to 1.0
    assert np.allclose(_eval(p, [2.0]), 1.0)


def test_events_sorted_by_time():
    p = _mkparam(default=0.0)
    p.set_value_at_time(3.0, 3.0)
    p.set_value_at_time(1.0, 1.0)
    p.set_value_at_time(2.0, 2.0)
    assert np.allclose(_eval(p, [1.5, 2.5, 3.5]), [1.0, 2.0, 3.0])


def test_a_rate_modulation_in_graph():
    # ConstantSource -> gain param: output = input * (gain + modulation).
    ctx = ga.OfflineAudioContext(superblock=2)
    src = ga.ConstantSourceNode(ctx)
    src.offset.value = 1.0
    gain = ga.GainNode(ctx)
    gain.gain.value = 0.25
    mod = ga.ConstantSourceNode(ctx)
    mod.offset.value = 0.5
    src.connect(gain).connect(ctx.destination)
    mod.connect(gain.gain)
    src.start(0)
    mod.start(0)
    out = ctx.render(256)
    assert np.allclose(out, 0.75, atol=1e-7)


def test_static_param_capacity_zero_then_first_event_retraces():
    """Untouched params encode with ZERO event capacity (constant fast
    path). Scheduling the first event AFTER a compiled render must still be
    honored: the capacity bump changes encoding shapes, which re-traces the
    cached program — no stale constant may survive."""
    import jax.numpy as jnp  # noqa: F401
    sr = 48000
    ctx = ga.OfflineAudioContext(sample_rate=sr, superblock=2)
    src = ga.ConstantSourceNode(ctx)
    gain = ga.GainNode(ctx)
    src.connect(gain).connect(ctx.destination)
    src.start(0)
    # first render: gain untouched -> capacity 0 -> constant fast path
    out1 = ctx.render(256)
    assert np.allclose(out1[0], 1.0)
    # now schedule the param's FIRST event and render on
    t0 = ctx.current_time
    gain.gain.set_value_at_time(0.25, t0)
    out2 = ctx.render(256)
    assert np.allclose(out2[0], 0.25), "first-ever event ignored (stale fast path)"
    # plain value writes on a still-event-free param stay on the fast path
    ctx2 = ga.OfflineAudioContext(sample_rate=sr, superblock=2)
    src2 = ga.ConstantSourceNode(ctx2)
    g2 = ga.GainNode(ctx2)
    src2.connect(g2).connect(ctx2.destination)
    src2.start(0)
    g2.gain.value = 0.5
    a = ctx2.render(256)
    assert np.allclose(a[0], 0.5)
    g2.gain.value = 0.125  # value change, still no events -> same program
    b = ctx2.render(256)
    assert np.allclose(b[0], 0.125)


def test_capacity_is_high_water_after_events_cleared():
    """The `value` setter clears the event list, but the event CAPACITY must
    not shrink back to 0: a shrink flips encoding shapes and retraces the
    renderer (an XLA recompile on remote-compile backends) twice per
    automate-then-set-value round trip. Values must still be correct."""
    sr = 48000
    ctx = ga.OfflineAudioContext(sample_rate=sr, superblock=2)
    src = ga.ConstantSourceNode(ctx)
    g = ga.GainNode(ctx)
    src.connect(g).connect(ctx.destination)
    src.start(0)
    g.gain.linear_ramp_to_value_at_time(0.5, 0.001)
    ctx.render(256)
    cap_key = (g.node_id, "gain")
    cap1 = ctx._compiled.param_capacity[cap_key]
    assert cap1 > 0
    g.gain.value = 0.25  # clears events
    out = ctx.render(256)
    assert np.allclose(out[0], 0.25)
    assert ctx._compiled.param_capacity[cap_key] == cap1, (
        "capacity shrank after events cleared: encoding shapes flip and the "
        "renderer retraces"
    )
    # re-automating within the high-water capacity keeps shapes too
    g.gain.set_value_at_time(0.125, ctx.current_time)
    out2 = ctx.render(256)
    assert np.allclose(out2[0], 0.125)
    assert ctx._compiled.param_capacity[cap_key] == cap1


def test_static_group_param_first_event_on_one_lane():
    """A group where one lane's param gains its first event later: the
    per-name shared capacity grows for every lane, the others still read
    their base values."""
    sr = 48000
    ctx = ga.OfflineAudioContext(sample_rate=sr, superblock=2)
    gains = []
    for v in range(4):
        src = ga.ConstantSourceNode(ctx)
        g = ga.GainNode(ctx)
        g.gain.value = float(v + 1)
        src.connect(g).connect(ctx.destination)
        src.start(0)
        gains.append(g)
    out1 = ctx.render(256)
    assert np.allclose(out1[0], 1 + 2 + 3 + 4)
    gains[2].gain.set_value_at_time(10.0, ctx.current_time)
    out2 = ctx.render(256)
    assert np.allclose(out2[0], 1 + 2 + 10 + 4)
