"""The five BASELINE.json benchmark configurations.

Each builder returns an OfflineAudioContext (graph fully wired and scheduled).
``python -m benchmarks.run`` renders them and reports xRT per config.
"""

from __future__ import annotations

import numpy as np

import graphaudio_tpu as ga
from graphaudio_tpu.kit import AudioEngine, ReverbEffect, SoundMixState

SR = 48000


def config1_buffer_gain(superblock=32):
    """1 AudioBufferSource -> GainNode -> destination, 30 s stereo."""
    rng = np.random.default_rng(1)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    n = 30 * SR
    buf = ga.PlayableAudioBuffer.from_stereo_arrays(
        (rng.standard_normal(n) * 0.3).astype(np.float32),
        (rng.standard_normal(n) * 0.3).astype(np.float32),
        SR,
    )
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = buf
    g = ga.GainNode(ctx)
    g.gain.value = 0.8
    src.connect(g).connect(ctx.destination)
    src.start(0)
    return ctx


def config2_mix_bus(superblock=32, voices=8):
    """8-voice mix bus with linear/exponential AudioParam ramps."""
    rng = np.random.default_rng(2)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    for v in range(voices):
        sig = (rng.standard_normal(2 * SR) * 0.1).astype(np.float32)
        src = ga.AudioBufferSourceNode(ctx)
        src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
        src.loop = True
        g = ga.GainNode(ctx)
        for t in range(0, 30, 2):
            g.gain.set_value_at_time(0.05, float(t))
            if v % 2 == 0:
                g.gain.linear_ramp_to_value_at_time(0.8, t + 1.0)
            else:
                g.gain.exponential_ramp_to_value_at_time(0.8, t + 1.0)
        src.connect(g).connect(ctx.destination)
        src.start(0)
    return ctx


def config3_eq_chain(superblock=32):
    """4 cascaded biquads with automated frequency/Q."""
    rng = np.random.default_rng(3)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    sig = (rng.standard_normal(2 * SR) * 0.2).astype(np.float32)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = ga.PlayableAudioBuffer.from_stereo_arrays(sig, sig[::-1].copy(), SR)
    src.loop = True
    node = src
    types = [
        ga.FilterType.LOWPASS,
        ga.FilterType.PEAKING,
        ga.FilterType.PEAKING,
        ga.FilterType.HIGHPASS,
    ]
    for i, t in enumerate(types):
        flt = ga.BiQuadFilterNode(ctx, type=t)
        flt.gain.value = 3.0 if t == ga.FilterType.PEAKING else 0.0
        for sec in range(0, 30, 3):
            flt.frequency.set_value_at_time(200.0 * (i + 1), float(sec))
            flt.frequency.linear_ramp_to_value_at_time(
                2000.0 * (i + 1), sec + 2.5
            )
            flt.q.set_value_at_time(0.5, float(sec))
            flt.q.linear_ramp_to_value_at_time(4.0, sec + 2.5)
        node = node.connect(flt)
    node.connect(ctx.destination)
    src.start(0)
    return ctx


def config4_conv_reverb(superblock=32, voices=64):
    """64 voices -> cubic resampler (44.1->48k) -> 2 s IR convolver -> gain."""
    rng = np.random.default_rng(4)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    master = ga.GainNode(ctx)
    master.gain.value = 0.5
    conv = ga.ConvolverNode(ctx)
    ir_len = 2 * SR
    decay = np.exp(-np.arange(ir_len) / (0.4 * SR))
    conv.buffer = ga.PlayableAudioBuffer.from_stereo_arrays(
        (rng.standard_normal(ir_len) * decay).astype(np.float32),
        (rng.standard_normal(ir_len) * decay).astype(np.float32),
        SR,
    )
    conv.connect(master).connect(ctx.destination)
    for _ in range(voices):
        sig = (rng.standard_normal(2 * 44100) * 0.05).astype(np.float32)
        src = ga.AudioBufferSourceNode(ctx)
        src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, 44100)
        src.loop = True
        src.playback_rate.value = 1.0  # resampler path
        src.connect(conv)
        src.start(0)
    return ctx


def config5_spatial_scene(superblock=32, voices=128):
    """128 moving spatialized sources with a shared reverb send
    (Kit AudioBus / EffectChain topology)."""
    rng = np.random.default_rng(5)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    engine = AudioEngine(ctx)
    engine.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])

    sfx = engine.get_bus("sfx")
    rev = ReverbEffect(engine)
    ir = (
        rng.standard_normal(SR) * np.exp(-np.arange(SR) / (0.25 * SR))
    ).astype(np.float32)
    rev.set_impulse_response(ga.PlayableAudioBuffer.from_mono_array(ir, SR))
    rev.wet.value = 0.3
    sfx.effects.add(rev)

    sounds = []
    for v in range(voices):
        sig = (rng.standard_normal(SR) * 0.03).astype(np.float32)
        buf = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
        s = engine.create_sound_from_buffer(
            buf, mix_state=SoundMixState.BINAURAL_SPATIALIZED, bus=sfx
        )
        s.is_looping = True
        angle = 2 * np.pi * v / voices
        s.position = (5 * np.cos(angle), 0.0, 5 * np.sin(angle))
        s.play()
        sounds.append(s)
    ctx._engine = engine  # keep alive; callers may move sounds via engine
    ctx._sounds = sounds
    return ctx


def config6_lfo_tremolo(superblock=32, voices=64, modulated=True):
    """64 voices with PER-VOICE LFO -> gain modulation (tremolo / ducking —
    bread-and-butter Web Audio, AudioParam.cs:66-70). Exercises modulated-
    param voice batching: the scene must compile O(1) stages (mod signature
    in group_key + per-lane mod routing), not one stage per voice.
    ``modulated=False`` builds the same scene with the LFO->depth chains
    kept but routed to a silent audio sink instead of the params — the
    xrt_compute ratio between the two isolates the MODULATION PLUMBING
    (per-lane mod stacking + clamp), not the oscillators' own cost."""
    rng = np.random.default_rng(6)
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    master = ga.GainNode(ctx)
    master.gain.value = 1.0 / voices
    master.connect(ctx.destination)
    sink = None
    if not modulated:
        sink = ga.GainNode(ctx)
        sink.gain.value = 0.0
        sink.connect(master)
    for v in range(voices):
        sig = (rng.standard_normal(SR) * 0.2).astype(np.float32)
        src = ga.AudioBufferSourceNode(ctx)
        src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
        src.loop = True
        g = ga.GainNode(ctx)
        g.gain.value = 0.6
        lfo = ga.OscillatorNode(ctx)
        lfo.frequency.value = 1.0 + 0.25 * v  # per-voice tremolo rate
        depth = ga.GainNode(ctx)
        depth.gain.value = 0.35
        lfo.connect(depth)
        depth.connect(g.gain if modulated else sink)
        lfo.start(0)
        src.connect(g).connect(master)
        src.start(0)
    return ctx


CONFIGS = {
    1: ("buffer_gain", config1_buffer_gain),
    2: ("mix_bus_ramps", config2_mix_bus),
    3: ("biquad_eq_chain", config3_eq_chain),
    4: ("conv_reverb_64", config4_conv_reverb),
    5: ("spatial_scene_128", config5_spatial_scene),
    6: ("lfo_tremolo_64", config6_lfo_tremolo),
}
