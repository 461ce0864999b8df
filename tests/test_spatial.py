"""SpatialPannerNode: direct path math + HRTF behavior."""

import numpy as np

import graphaudio_tpu as ga
from graphaudio_tpu.nodes.spatial import DistanceModelType, SpatialPannerNode

SR = 48000


def _scene(distance_model=DistanceModelType.INVERSE, superblock=2):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=superblock)
    ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    src = ga.ConstantSourceNode(ctx)
    src.start(0)
    sp = SpatialPannerNode(ctx)
    sp.distance_model = distance_model
    src.connect(sp).connect(ctx.destination)
    return ctx, sp


def _rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def test_lateralization():
    ctx, sp = _scene()
    sp.position_x.value = 5.0  # listener's right
    out = ctx.render(4096)
    assert _rms(out[1, 2048:]) > _rms(out[0, 2048:])
    sp.position_x.value = -5.0  # left
    ctx.render(4096)  # flush transition
    out = ctx.render(4096)
    assert _rms(out[0, 2048:]) > _rms(out[1, 2048:])


def test_inverse_distance_attenuation():
    ctx, sp = _scene()
    sp.position_x.value = 2.0
    a = _rms(ctx.render(4096)[:, 2048:])
    sp.position_x.value = 20.0
    ctx.render(4096)
    b = _rms(ctx.render(4096)[:, 2048:])
    # inverse model: ref/d -> 10x distance = 10x quieter
    assert abs(a / b - 10.0) < 0.5


def test_linear_distance_model():
    ctx, sp = _scene(DistanceModelType.LINEAR)
    sp.ref_distance.value = 1.0
    sp.max_distance.value = 11.0
    sp.position_z.value = -6.0  # ahead, distance 6
    out = ctx.render(4096)
    # linear: 1 - (6-1)/(11-1) = 0.5
    ctx2, sp2 = _scene(DistanceModelType.LINEAR)
    sp2.ref_distance.value = 1.0
    sp2.max_distance.value = 11.0
    sp2.position_z.value = -1.0  # at ref distance -> gain 1
    ref = ctx2.render(4096)
    ratio = _rms(out[:, 2048:]) / _rms(ref[:, 2048:])
    assert abs(ratio - 0.5) < 0.05


def test_exponential_distance_model():
    ctx, sp = _scene(DistanceModelType.EXPONENTIAL)
    sp.rolloff_factor.value = 2.0
    sp.position_z.value = -4.0
    out = ctx.render(4096)
    ctx2, sp2 = _scene(DistanceModelType.EXPONENTIAL)
    sp2.rolloff_factor.value = 2.0
    sp2.position_z.value = -2.0
    ref = ctx2.render(4096)
    # (4/2)^-2 = 1/4 relative
    ratio = _rms(out[:, 2048:]) / _rms(ref[:, 2048:])
    assert abs(ratio - 0.25) < 0.03


def test_cone_directivity():
    # Source ahead of listener, pointing AWAY (listener outside the cone).
    ctx, sp = _scene()
    sp.position_z.value = -2.0
    sp.cone_inner_angle.value = 60.0
    sp.cone_outer_angle.value = 90.0
    sp.cone_outer_gain.value = 0.25
    # Source at (0,0,-2): direction source->listener is +z, so orientation
    # (0,0,1) faces the listener (reference computes dot(orientation,
    # -worldDirection) with worldDirection = listener->source).
    sp.orientation_x.value = 0.0
    sp.orientation_z.value = 1.0  # facing the listener
    facing = _rms(ctx.render(4096)[:, 2048:])
    sp.orientation_z.value = -1.0  # facing away
    ctx.render(4096)
    away = _rms(ctx.render(4096)[:, 2048:])
    assert abs(away / facing - 0.25) < 0.05


def test_spatial_blend_zero_is_dry():
    ctx, sp = _scene()
    sp.position_x.value = 3.0
    sp.spatial_blend.value = 0.0
    out = ctx.render(4096)
    # dry path: mono source upmixed identically to both ears
    assert np.allclose(out[0, 2048:], out[1, 2048:], atol=1e-6)


def test_occlusion_attenuates():
    ctx, sp = _scene()
    sp.position_z.value = -2.0
    open_rms = _rms(ctx.render(4096)[:, 2048:])
    sp.occlusion.value = 1.0
    ctx.render(4096)
    occluded = _rms(ctx.render(4096)[:, 2048:])
    assert occluded < open_rms * 0.05

    # transmission lets the low band through
    sp.transmission_low.value = 0.8
    ctx.render(4096)
    trans = _rms(ctx.render(4096)[:, 2048:])
    assert trans > occluded * 5


def test_itd_present():
    # A click from the right arrives earlier in the right ear.
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=1)
    ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    click = np.zeros(4096, np.float32)
    click[64] = 1.0
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(click, SR)
    sp = SpatialPannerNode(ctx)
    src.connect(sp).connect(ctx.destination)
    sp.position_x.value = 10.0
    src.start(0)
    out = ctx.render(1024)
    peak_l = int(np.argmax(np.abs(out[0])))
    peak_r = int(np.argmax(np.abs(out[1])))
    assert peak_r < peak_l  # right ear leads
    # Woodworth max ITD ~ (a/c)(pi/2+1) ~ 0.66ms ~ 31 samples; expect > 10.
    assert 5 <= peak_l - peak_r <= 40


def test_batched_spatial_voices(rng):
    # Several panners with the same config batch into one vmapped stage.
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    for i in range(4):
        src = ga.ConstantSourceNode(ctx)
        src.offset.value = 0.1
        src.start(0)
        sp = SpatialPannerNode(ctx)
        sp.position_x.value = float(i - 2)
        src.connect(sp).connect(ctx.destination)
    from graphaudio_tpu.core.graph import CompiledGraph

    cg = CompiledGraph(ctx)
    kinds = {(k, len(ns), type(ns[0]).__name__) for k, ns, _ in cg.stages}
    assert ("group", 4, "SpatialPannerNode") in kinds
    out = ctx.render(2048)
    assert np.isfinite(out).all() and np.abs(out).max() > 0


def _synthetic_measured_set(sr=48000, n=64):
    """A measured-style HRIR set: per-direction deltas with direction-coded
    delay and gain (easy to verify after regridding)."""
    rng = np.random.default_rng(5)
    azs, els, irs = [], [], []
    for el_deg in (-30, 0, 30):
        for az_deg in range(0, 360, 30):
            ir = np.zeros((2, n), np.float32)
            d = 3 + (az_deg // 30) % 4
            ir[0, d] = 1.0
            ir[1, d + 1] = 0.8
            azs.append(az_deg)
            els.append(el_deg)
            irs.append(ir)
    return {
        "hrir": np.stack(irs),
        "azimuth_deg": np.asarray(azs, np.float64),
        "elevation_deg": np.asarray(els, np.float64),
        "sample_rate": sr,
    }


def test_load_hrir_grid_exact_at_measurement_directions():
    from graphaudio_tpu.ops.hrtf import load_hrir_grid

    data = _synthetic_measured_set()
    # 12 azimuths / 30-degree steps line up with a 12-column grid
    grid = load_hrir_grid(data, 48000, n_azimuth=12, n_elevation=7)
    assert grid.shape == (7, 12, 2, 64)
    # grid azimuth is CLOCKWISE; the set's is counterclockwise (SOFA).
    # elevation row 3 = 0 degrees; set entry az_deg=60 -> grid col (12-2)=10.
    m = data["hrir"][np.asarray(data["elevation_deg"]) == 0]
    np.testing.assert_allclose(grid[3, 0], m[0], atol=1e-7)
    np.testing.assert_allclose(grid[3, 10], m[2], atol=1e-7)


import pytest


@pytest.mark.parametrize("taps", [64, 100])
def test_grid_interp_matches_direct_convolution(rng, taps):
    """Bilinearly interpolated grid spectra applied in the frequency domain
    must equal direct time-domain convolution with the same interpolated
    HRIR (the linearity argument the pipeline relies on)."""
    import jax.numpy as jnp

    from graphaudio_tpu.ops.hrtf import (
        fir_freq_per_block, hrir_grid_spectra, hrtf_fft_size, interp_hrir,
        load_hrir_grid,
    )

    data = _synthetic_measured_set(n=taps)
    grid = load_hrir_grid(data, 48000, n_azimuth=12, n_elevation=7)
    assert grid.shape[-1] == taps  # 64 rides the 192-pt path, 100 the 256-pt
    az = np.float32(0.7)
    el = np.float32(0.2)

    # time-domain: interpolate the HRIR itself, convolve directly
    h = np.asarray(
        interp_hrir(jnp.asarray(grid), jnp.asarray([az]), jnp.asarray([el]))
    )[0]  # [2, 64]
    sig = (rng.standard_normal(256) * 0.5).astype(np.float32)
    want = np.stack([np.convolve(sig, h[e])[:256] for e in range(2)])

    # frequency-domain pipeline (what SpatialPannerNode runs)
    sr_g, si_g = hrir_grid_spectra(grid)
    hr = interp_hrir(jnp.asarray(sr_g), jnp.asarray([az, az]), jnp.asarray([el, el]))
    hi = interp_hrir(jnp.asarray(si_g), jnp.asarray([az, az]), jnp.asarray([el, el]))
    tail = hrtf_fft_size(grid.shape[-1]) - 128
    y, _ = fir_freq_per_block(
        jnp.asarray(sig.reshape(2, 128)), hr, hi,
        jnp.zeros((2, tail), jnp.float32)
    )
    got = np.asarray(y).reshape(2, 256)
    assert np.abs(got - want).max() < 1e-4


def test_spatial_panner_load_hrir_changes_render(rng):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=4)
    src = ga.AudioBufferSourceNode(ctx)
    sig = (rng.standard_normal(SR // 4) * 0.3).astype(np.float32)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
    pan = SpatialPannerNode(ctx)
    pan.position_x.value = 2.0
    src.connect(pan).connect(ctx.destination)
    src.start(0)
    base = np.asarray(ctx.render(2048))

    pan.load_hrir(_synthetic_measured_set())
    custom = np.asarray(ctx.render(2048))
    assert not np.allclose(base, custom)  # measured set actually in use

    pan.clear_hrir()
    back = np.asarray(ctx.render(2048))
    # analytic model restored (different segment of the loop, so just check
    # the custom-set signature is gone: delayed delta vs spherical shadow)
    assert not np.allclose(custom, back)


def test_pinna_elevation_notch_in_analytic_grid():
    """The analytic default's pinna reflection produces an elevation-
    dependent spectral notch: the first notch frequency rises with
    elevation (the dominant monaural elevation cue)."""
    from graphaudio_tpu.ops.hrtf import build_hrir_grid

    grid = build_hrir_grid(48000)
    E, A = grid.shape[:2]

    def first_notch_hz(ei):
        ir = grid[ei, 0, 0].astype(np.float64)  # straight ahead, left ear
        spec = np.abs(np.fft.rfft(ir, 512))
        freqs = np.arange(spec.shape[0]) * 48000 / 512
        band = (freqs > 3500) & (freqs < 14000)
        return freqs[band][np.argmin(spec[band])]

    low = first_notch_hz(1)       # below the horizon
    mid = first_notch_hz(E // 2)  # horizontal
    high = first_notch_hz(E - 2)  # above
    assert low < mid < high, (low, mid, high)


def test_context_default_hrir_applies_to_all_panners(rng):
    """set_default_hrir upgrades every panner without a per-node override
    (parity: the reference's per-context default HRTF,
    SteamAudioContext.cs:82-106), matches the per-node load_hrir render,
    keeps voices batched in one group, and reverts with None."""
    sig = (rng.standard_normal(SR // 4) * 0.2).astype(np.float32)
    measured = _synthetic_measured_set()

    def scene():
        ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=4)
        pans = []
        for i in range(2):
            src = ga.AudioBufferSourceNode(ctx)
            src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
            pan = SpatialPannerNode(ctx)
            pan.position_x.value = 2.0 * (1 if i == 0 else -1)
            src.connect(pan).connect(ctx.destination)
            src.start(0)
            pans.append(pan)
        return ctx, pans

    ctx1, pans1 = scene()
    ctx1.set_default_hrir(measured)
    got = np.asarray(ctx1.render(1024))
    # one batched spatial-panner group (shared context default)
    groups = [sp for sp in ctx1._compiled.plan
              if sp["group_key"] and sp["group_key"][0] == "spatial-panner"]
    assert len(groups) == 1 and groups[0]["n_lanes"] == 2

    ctx2, pans2 = scene()
    for p in pans2:
        p.load_hrir(measured)
    want = np.asarray(ctx2.render(1024))
    np.testing.assert_allclose(got, want, atol=1e-6)

    ctx3, _ = scene()
    base = np.asarray(ctx3.render(1024))
    assert not np.allclose(got, base)  # measured default actually in use
    ctx1.set_default_hrir(None)
    reverted = np.asarray(ctx1.render(1024))
    analytic_cont = np.asarray(ctx3.render(1024))
    # carried per-voice state (OLA tail, crossover one-poles) from the
    # measured segment decays within ~2 quanta; compare past it
    np.testing.assert_allclose(
        reverted[:, 256:], analytic_cont[:, 256:], atol=1e-6
    )


def test_default_hrir_reaches_modulated_single_stage_panner(rng):
    """A panner with a MODULATED param compiles as a single stage keyed by
    its static fingerprint; set_default_hrir must bump that fingerprint
    (mirroring load_hrir) or the program cache replays the analytic kernel
    with the old grid baked in (round-3 advisor finding, context.py:126)."""
    sig = (rng.standard_normal(SR // 4) * 0.2).astype(np.float32)
    measured = _synthetic_measured_set()

    def scene():
        ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=4)
        src = ga.AudioBufferSourceNode(ctx)
        src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
        pan = SpatialPannerNode(ctx)
        pan.position_x.value = 2.0
        lfo = ga.ConstantSourceNode(ctx)
        lfo.offset.value = 0.5
        lfo.connect(pan.position_z)  # modulation input -> single-stage compile
        lfo.start(0)
        src.connect(pan).connect(ctx.destination)
        src.start(0)
        return ctx

    ctx1 = scene()
    ctx1.render(1024)  # compile + run the analytic-model program first
    ctx1.set_default_hrir(measured)
    got = np.asarray(ctx1.render(1024))

    ctx2 = scene()
    ctx2.set_default_hrir(measured)  # installed before any render
    want = np.asarray(ctx2.render(2048))[:, 1024:]
    # carried per-voice state (OLA tail) from ctx1's analytic segment decays
    # within ~2 quanta; compare past it
    np.testing.assert_allclose(got[:, 512:], want[:, 512:], atol=1e-6)


def test_engine_default_hrir_passthrough():
    from graphaudio_tpu.kit import AudioEngine

    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    engine = AudioEngine(ctx)
    engine.set_default_hrir(_synthetic_measured_set())
    assert ctx._default_hrir is not None
    engine.set_default_hrir(None)
    assert ctx._default_hrir is None


def test_occlusion_first_touch_recompiles(rng):
    """Pristine occlusion compiles the band split out; touching it
    mid-stream recompiles into the 3-band path and attenuates."""
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    src = ga.AudioBufferSourceNode(ctx)
    sig = (rng.standard_normal(SR // 2) * 0.3).astype(np.float32)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
    src.loop = True
    pan = SpatialPannerNode(ctx)
    pan.position_x.value = 2.0
    src.connect(pan).connect(ctx.destination)
    src.start(0)
    before = np.asarray(ctx.render(1024))
    key_before = pan.group_key([1])
    pan.occlusion.value = 0.9  # no transmission: heavy broadband cut
    after = np.asarray(ctx.render(1024))
    assert pan.group_key([1]) != key_before
    assert _rms(after) < 0.25 * _rms(before)


def test_occlusion_touch_recompiles_modulated_stage(rng):
    """Touching occlusion on a panner with a modulated param must
    invalidate the cached band-less program. Modulated panners now compile
    as (1-lane) GROUP stages whose key includes _occlusion_active() and the
    mod signature — the touch re-keys the stage, replacing the old
    single-stage static-fingerprint bump."""
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    src = ga.AudioBufferSourceNode(ctx)
    sig = (rng.standard_normal(SR // 2) * 0.3).astype(np.float32)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
    src.loop = True
    pan = SpatialPannerNode(ctx)
    pan.position_z.value = -2.0
    mod = ga.ConstantSourceNode(ctx)
    mod.offset.value = 0.0
    mod.connect(pan.spatial_blend)  # param modulation -> single stage
    mod.start(0)
    src.connect(pan).connect(ctx.destination)
    src.start(0)
    # Same render length before and after the touch: an equal-length scan
    # would NOT retrace a reused cached program, so only the config-version
    # bump separates the variants (this is the regression).
    ctx.render(4096)
    assert any(
        sp["kind"] == "group"
        and type(sp["rep"]).__name__ == "SpatialPannerNode"
        for sp in ctx._compiled.plan
    )
    # Occlude fully with high-band-only transmission: a stale band-less
    # kernel would apply the LOW band's gain (0 -> silence) broadband.
    pan.occlusion.value = 1.0
    pan.transmission_high.value = 0.9
    out = np.asarray(ctx.render(4096))
    assert np.sqrt(np.mean(out[:, 2048:] ** 2)) > 1e-4
    # and the high band dominates the spectrum (3-band path really active)
    spec = np.abs(np.fft.rfft(out[0, 2048:].astype(np.float64)))
    freqs = np.arange(spec.shape[0]) * SR / 2048
    low = spec[(freqs > 100) & (freqs < 800)].mean()
    high = spec[(freqs > 9000) & (freqs < 20000)].mean()
    assert high > 3 * low


# ---- partitioned long-kernel HRTF (measured sets past 128 taps) --------------


def _dense_measured_set(rng, sr=48000, n=320):
    """Dense random HRIRs (every tap significant, unlike the delta set) so
    long-kernel rendering errors can't hide."""
    azs, els, irs = [], [], []
    for el_deg in (-30, 0, 30):
        for az_deg in range(0, 360, 30):
            ir = (rng.standard_normal((2, n)) * np.exp(
                -np.arange(n) / (n / 4.0)
            )).astype(np.float32) * 0.2
            azs.append(az_deg)
            els.append(el_deg)
            irs.append(ir)
    return {
        "hrir": np.stack(irs),
        "azimuth_deg": np.asarray(azs, np.float64),
        "elevation_deg": np.asarray(els, np.float64),
        "sample_rate": sr,
    }


def test_hrir_partition_count():
    from graphaudio_tpu.ops.hrtf import hrir_partition_count

    assert hrir_partition_count(32) == 1
    assert hrir_partition_count(64) == 1
    assert hrir_partition_count(100) == 1
    assert hrir_partition_count(128) == 1
    assert hrir_partition_count(129) == 2
    assert hrir_partition_count(320) == 3
    assert hrir_partition_count(1024) == 8


def test_load_hrir_grid_default_keeps_two_partitions(rng):
    from graphaudio_tpu.ops.hrtf import load_hrir_grid

    data = _dense_measured_set(rng, n=400)
    grid = load_hrir_grid(data, 48000, n_azimuth=12, n_elevation=7)
    assert grid.shape[-1] == 256  # default: min(N, 256), not the old 128 cap


def test_partitioned_fir_static_exact(rng):
    """A static 320-tap kernel through fir_freq_partitioned (3 partitions,
    state carried across two superblock calls) equals one long direct
    convolution — the partitioned overlap-add is exact, not approximate."""
    import jax.numpy as jnp

    from graphaudio_tpu.ops.hrtf import (
        fir_freq_partitioned, hrir_grid_spectra, hrir_partition_count,
        interp_hrir, load_hrir_grid,
    )

    data = _dense_measured_set(rng, n=320)
    grid = load_hrir_grid(data, 48000, n_azimuth=12, n_elevation=7, length=320)
    P = hrir_partition_count(320)
    assert P == 3
    sr_g, si_g = hrir_grid_spectra(grid)
    assert sr_g.shape == grid.shape[:3] + (P, 129)

    az, el = 0.7, 0.2
    S = 4
    sig = (rng.standard_normal(2 * S * 128) * 0.5).astype(np.float32)

    # time-domain reference: one long convolution with the interpolated HRIR
    h = np.asarray(
        interp_hrir(jnp.asarray(grid), jnp.asarray([az]), jnp.asarray([el]))
    )[0]  # [2, 320]
    want = np.stack(
        [np.convolve(sig, h[e])[: sig.shape[0]] for e in range(2)]
    )

    ring = jnp.zeros((P - 1, 258), jnp.float32)
    ola = jnp.zeros((2, 128), jnp.float32)
    azv = jnp.full((P - 1 + S,), az, jnp.float32)
    elv = jnp.full((P - 1 + S,), el, jnp.float32)
    hr = interp_hrir(jnp.asarray(sr_g), azv, elv)  # [P-1+S, 2, P, 129]
    hi = interp_hrir(jnp.asarray(si_g), azv, elv)
    outs = []
    for half in range(2):
        x = sig[half * S * 128 : (half + 1) * S * 128].reshape(S, 128)
        y, ring, ola = fir_freq_partitioned(jnp.asarray(x), hr, hi, ring, ola)
        outs.append(np.asarray(y).reshape(2, S * 128))
    got = np.concatenate(outs, axis=1)
    assert np.abs(got - want).max() < 1e-4


def test_partitioned_hrtf_matches_oracle_moving(rng):
    """Full context render with a MOVING source and a 320-tap measured set
    vs the literal numpy oracle (per-block time-domain convolution with
    input-time kernels): the partitioned frequency-domain path must agree
    to DFT roundoff even while the kernel changes every quantum."""
    from graphaudio_tpu.ops.hrtf import load_hrir_grid
    from graphaudio_tpu.testing.oracle import (
        OracleBufferSource, OracleContext, OracleSpatialPanner,
    )

    data = _dense_measured_set(rng, n=320)
    grid = load_hrir_grid(data, SR, n_azimuth=12, n_elevation=7, length=320)
    sig = (rng.standard_normal(SR // 8) * 0.3).astype(np.float32)

    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=8)
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
    src.loop = True
    pan = SpatialPannerNode(ctx)
    pan.load_hrir(data, n_azimuth=12, n_elevation=7, length=320)
    pan.position_x.set_value_at_time(3.0, 0.0)
    pan.position_x.linear_ramp_to_value_at_time(-3.0, 0.1)
    pan.position_z.value = -2.0
    src.connect(pan).connect(ctx.destination)
    src.start(0)
    got = np.asarray(ctx.render(SR // 8))

    octx = OracleContext(sample_rate=SR)
    osrc = OracleBufferSource(octx)
    osrc.set_buffer(sig, SR)
    osrc.loop = True
    opan = OracleSpatialPanner(octx, grid)
    opan.position_x.set_value_at_time(3.0, 0.0)
    opan.position_x.linear_ramp_to_value_at_time(-3.0, 0.1)
    opan.position_z.value = -2.0
    osrc.connect(opan).connect(octx.destination)
    osrc.start(0)
    want = octx.render(SR // 8)

    # Skip block 1 (documented oracle channel-count startup transient).
    assert np.max(np.abs(got[:, 128:] - want[:, 128:])) < 2e-5
