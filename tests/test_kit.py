"""Kit layer: engine, buses, sounds, effect chains, cache, anchors."""

import numpy as np
import pytest

import graphaudio_tpu as ga
from graphaudio_tpu.io import write_wav
from graphaudio_tpu.kit import (
    AudioBufferCache,
    AudioBufferCacheOptions,
    AudioEngine,
    BufferedSound,
    EffectChain,
    FileSystemDataProvider,
    LinearSpatialBlendController,
    NodeEffect,
    ReverbEffect,
    SoundMixState,
    SpatialAnchor,
    StepLinearConfig,
    step_linear_calculate,
)

SR = 48000


@pytest.fixture
def engine():
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    return AudioEngine(ctx)


@pytest.fixture
def assets(tmp_path, rng):
    sig = (rng.standard_normal(8000) * 0.4).astype(np.float32)
    write_wav(tmp_path / "beep.wav", sig[None], SR, float32=True)
    return str(tmp_path), sig


# -- buses ---------------------------------------------------------------------


def test_bus_hierarchy_auto_creates_parents(engine):
    bus = engine.get_bus("sfx/player/steps")
    assert engine.has_bus("sfx")
    assert engine.has_bus("sfx/player")
    assert bus.parent.path == "sfx/player"
    assert bus.parent.parent.path == "sfx"
    assert bus.parent.parent.parent is engine.master_bus
    assert engine.get_bus("sfx/player/steps") is bus  # cached


def test_bus_gain_and_mute(engine, rng):
    buf = ga.PlayableAudioBuffer.from_mono_array(
        rng.standard_normal(4096).astype(np.float32), SR
    )
    bus = engine.get_bus("sfx")
    sound = engine.create_sound_from_buffer(buf, bus=bus)
    sound.play()
    bus.gain = 0.5
    out = engine.context.render(1024)
    assert np.abs(out[0] - buf.data[0][:1024] * np.float32(0.5)).max() < 1e-6
    bus.muted = True
    engine.context.render(1024)  # flush transition boundary
    out = engine.context.render(1024)
    assert np.allclose(out, 0.0)
    bus.muted = False
    assert bus.gain == 0.5


def test_master_path_normalization(engine):
    assert engine.get_bus("  MASTER ") is engine.master_bus
    with pytest.raises(ValueError):
        engine.get_bus("   ")


# -- sounds ---------------------------------------------------------------------


def test_buffered_sound_play_and_reap(engine, rng):
    buf = ga.PlayableAudioBuffer.from_mono_array(
        rng.standard_normal(2048).astype(np.float32), SR
    )
    sound = engine.create_sound_from_buffer(buf)
    sound.is_one_shot = True
    sound.play()
    assert sound.is_playing
    out = engine.context.render(1024)
    assert np.abs(out[0] - buf.data[0][:1024]).max() < 1e-6
    engine.context.render(2048)  # run past the end -> source ends
    engine.update()
    assert sound.is_disposed
    assert sound not in engine.active_sounds


def test_buffered_sound_restart_and_seek(engine, rng):
    data = np.arange(1, 8001, dtype=np.float32)
    buf = ga.PlayableAudioBuffer.from_mono_array(data, SR)
    sound = engine.create_sound_from_buffer(buf)
    sound.play()
    out = engine.context.render(512)
    assert np.array_equal(out[0], data[:512])
    sound.seek(1000.0 / SR)
    out = engine.context.render(512)
    assert np.array_equal(out[0], data[1000:1512])
    sound.play()  # restart from 0
    out = engine.context.render(512)
    assert np.array_equal(out[0], data[:512])
    sound.stop()
    out = engine.context.render(512)
    assert np.allclose(out, 0.0)


def test_sound_gain_property(engine, rng):
    buf = ga.PlayableAudioBuffer.from_mono_array(
        rng.standard_normal(4096).astype(np.float32), SR
    )
    sound = engine.create_sound_from_buffer(buf)
    sound.gain = 0.25
    sound.play()
    out = engine.context.render(1024)
    assert np.abs(out[0] - buf.data[0][:1024] * np.float32(0.25)).max() < 1e-6


def test_set_bus_rewires(engine, rng):
    buf = ga.PlayableAudioBuffer.from_mono_array(
        np.ones(8192, np.float32), SR
    )
    sound = engine.create_sound_from_buffer(buf)
    sfx = engine.get_bus("sfx")
    sound.set_bus("sfx")
    assert sound.bus is sfx
    sfx.gain = 0.5
    sound.play()
    out = engine.context.render(1024)
    assert np.allclose(out[0], 0.5, atol=1e-6)


def test_streaming_sound(engine, assets):
    base, sig = assets
    engine.data_provider = FileSystemDataProvider(base)
    sound = engine.create_streaming_sound("beep.wav")
    sound.play()
    assert sound.is_playing
    out = engine.context.render(2048)
    assert np.abs(out[0] - sig[:2048]).max() < 1e-6
    sound.pause()
    assert not sound.is_playing


def test_play_one_shot(engine, assets):
    base, sig = assets
    engine.data_provider = FileSystemDataProvider(base)
    sound = engine.play_one_shot("beep.wav")
    assert sound is not None and sound.is_one_shot
    out = engine.context.render(1024)
    assert np.abs(out[0] - sig[:1024]).max() < 1e-6


def test_play_one_shot_without_provider_logs(engine, capsys):
    assert engine.play_one_shot("missing.wav") is None
    assert "data_provider is None" in capsys.readouterr().out


def test_step_linear_sound(engine, rng):
    buf = ga.PlayableAudioBuffer.from_mono_array(
        np.ones(48000, np.float32), SR
    )
    sound = engine.create_sound_from_buffer(
        buf, mix_state=SoundMixState.STEP_LINEAR_SPATIALIZED
    )
    sound.position = (5.0, 0.0, 0.0)  # right of listener
    sound.play()
    engine.update()
    out = engine.context.render(1024)
    r = np.sqrt(np.mean(out[1, 256:] ** 2))
    l = np.sqrt(np.mean(out[0, 256:] ** 2))
    assert r > l  # panned right


def test_fades(engine, rng):
    buf = ga.PlayableAudioBuffer.from_mono_array(np.ones(48000, np.float32), SR)
    sound = engine.create_sound_from_buffer(buf)
    sound.play(fade_in_duration=0.01)
    out = engine.context.render(960)[0]
    assert abs(out[2]) < 0.01  # starts near silent
    assert out[900] > 0.9  # ramped up

    sound2 = engine.create_sound_from_buffer(buf)
    sound2.play()
    sound2.stop(fade_out_duration=0.005)
    out = engine.context.render(480)[0]
    engine.update()  # deadline passed -> deferred stop runs
    assert not sound2.is_playing


# -- effects -------------------------------------------------------------------------


def test_effect_chain_rebuild(engine, rng):
    buf = ga.PlayableAudioBuffer.from_mono_array(np.ones(48000, np.float32), SR)
    sound = engine.create_sound_from_buffer(buf)
    g1 = ga.GainNode(engine.context)
    g1.gain.value = 0.5
    e1 = NodeEffect(engine, g1)
    sound.effects.add(e1)
    sound.play()
    out = engine.context.render(1024)
    assert np.allclose(out[0], 0.5, atol=1e-6)

    g2 = ga.GainNode(engine.context)
    g2.gain.value = 0.5
    sound.effects.insert(1, NodeEffect(engine, g2))
    assert sound.effects.count == 2
    out = engine.context.render(1024)
    assert np.allclose(out[0], 0.25, atol=1e-6)

    sound.effects.remove_at(0)
    out = engine.context.render(1024)
    assert np.allclose(out[0], 0.5, atol=1e-6)

    sound.effects.clear()
    out = engine.context.render(1024)
    assert np.allclose(out[0], 1.0, atol=1e-6)


def test_reverb_effect(engine, rng):
    buf = ga.PlayableAudioBuffer.from_mono_array(
        (rng.standard_normal(48000) * 0.2).astype(np.float32), SR
    )
    sound = engine.create_sound_from_buffer(buf)
    rev = ReverbEffect(engine)
    ir = (rng.standard_normal(2000) * np.exp(-np.arange(2000) / 500)).astype(np.float32)
    rev.set_impulse_response(ga.PlayableAudioBuffer.from_mono_array(ir, SR))
    rev.dry.value = 0.0  # wet only
    sound.effects.add(rev)
    sound.play()
    out = engine.context.render(4096)
    assert np.isfinite(out).all() and np.abs(out).max() > 0
    # wet=0 too -> silence
    rev.wet.value = 0.0
    engine.context.render(2048)
    out = engine.context.render(2048)
    assert np.allclose(out, 0.0, atol=1e-7)


# -- cache / providers / anchors -----------------------------------------------------


def test_buffer_cache_lru_eviction():
    cache = AudioBufferCache(AudioBufferCacheOptions(max_cached_buffers=2))
    cache.add("a", 1)
    cache.add("b", 2)
    assert cache.try_get("a") == 1  # refresh a
    cache.add("c", 3)  # evicts b (LRU)
    assert cache.contains("a") and cache.contains("c")
    assert not cache.contains("b")
    assert cache.count == 2


def test_cache_get_or_load(engine, assets):
    base, sig = assets
    provider = FileSystemDataProvider(base)
    b1 = engine.buffer_cache.get_or_load("beep.wav", provider)
    b2 = engine.buffer_cache.get_or_load("beep.wav", provider)
    assert b1 is b2


def test_provider_path_escape_guard(assets):
    base, _ = assets
    provider = FileSystemDataProvider(base)
    with pytest.raises((PermissionError, FileNotFoundError)):
        provider.get_bytes("../../etc/passwd")


def test_spatial_anchor_versioning(engine, rng):
    buf = ga.PlayableAudioBuffer.from_mono_array(np.ones(48000, np.float32), SR)
    sound = engine.create_sound_from_buffer(
        buf, mix_state=SoundMixState.STEP_LINEAR_SPATIALIZED
    )
    anchor = SpatialAnchor((1.0, 0.0, 0.0))
    sound.anchor = anchor
    sound.play()
    engine.update()
    p1 = sound._stereo_panner.pan.value
    anchor.position = (10.0, 0.0, 0.0)
    engine.update()
    p2 = sound._stereo_panner.pan.value
    assert p2 > p1  # moved further right


def test_step_linear_calculator():
    cfg = StepLinearConfig(pan_step=0.1, gain_step=0.05,
                           behind_pitch_decrease=0.015, pitch_lower_limit=0.1)
    r = step_linear_calculate((0, 0, 0), (3, 0, 0), cfg, 0.0, 1.0, 1.0)
    assert abs(r.pan - 0.3) < 1e-6
    assert abs(r.gain - 0.85) < 1e-6
    assert r.pitch == 1.0
    r = step_linear_calculate((0, 0, 0), (0, -2, 0), cfg, 0.0, 1.0, 1.0)
    assert abs(r.pitch - 0.985) < 1e-6
    r = step_linear_calculate((0, 0, 0), (-30, 0, 0), cfg, 0.0, 1.0, 1.0)
    assert r.pan == -1.0  # clamped
    assert abs(r.gain - (1.0 - 30 * 0.05)) < 1e-6
    r = step_linear_calculate((0, 0, 0), (-50, 0, 0), cfg, 0.0, 1.0, 1.0)
    assert r.gain == -1.0  # floored


def test_linear_blend_controller():
    c = LinearSpatialBlendController(2.0, 12.0, 0.0, 1.0)
    assert c.get_blend(1.0) == 0.0
    assert c.get_blend(20.0) == 1.0
    assert abs(c.get_blend(7.0) - 0.5) < 1e-6
    with pytest.raises(ValueError):
        LinearSpatialBlendController(5.0, 5.0)


def test_preload_buffers_parallel(engine, tmp_path, rng):
    """preload_buffers decodes a batch on a thread pool (parity:
    PreloadBuffersAsync fans out one task per path, AudioEngine.cs:238-252)."""
    from graphaudio_tpu.io import write_wav as _ww

    paths = []
    for i in range(12):
        sig = (rng.standard_normal(4000) * 0.2).astype(np.float32)
        _ww(tmp_path / f"p{i}.wav", sig[None], SR, float32=True)
        paths.append(f"p{i}.wav")
    engine.data_provider = FileSystemDataProvider(str(tmp_path))
    engine.preload_buffers(paths)
    for p in paths:
        assert engine.buffer_cache.contains(p)


def test_preload_buffers_parallel_propagates_errors(engine, tmp_path):
    engine.data_provider = FileSystemDataProvider(str(tmp_path))
    with pytest.raises(Exception):
        engine.preload_buffers(["missing1.wav", "missing2.wav"])


def test_async_loading_surface(engine, assets):
    """Awaitable variants (parity: CreateBufferedSoundAsync /
    PreloadBuffersAsync / LoadFromFileAsync)."""
    import asyncio
    import os

    from graphaudio_tpu.io import AudioDecoder

    base, sig = assets
    engine.data_provider = FileSystemDataProvider(base)

    async def run():
        await engine.preload_buffers_async(["beep.wav"])
        sound = await engine.create_buffered_sound_async("beep.wav")
        buf = await AudioDecoder.load_from_file_async(
            os.path.join(base, "beep.wav")
        )
        return sound, buf

    sound, buf = asyncio.run(run())
    assert engine.buffer_cache.contains("beep.wav")
    assert buf.length == len(sig)
    sound.play()
    out = engine.context.render(1024)
    assert np.abs(out[0] - sig[:1024]).max() < 1e-6
