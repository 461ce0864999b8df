"""The measured-HRTF path, certified end-to-end via a synthetic SOFA file.

The reference's per-context measured HRTF is phonon's built-in set
(SteamAudioContext.cs:82-106, rendered at SpatialPannerNode.cs:250-260).
No third-party measured data can be bundled here (zero-egress build), so a
synthetic MEASURED-LIKE set (testing/sofa_fixture.py — per-direction
ITD/ILD + direction-coded noise tails no analytic model reproduces) is
written as a standard AES69 SOFA HDF5 file and driven through the whole
chain: HDF5 parse -> coordinate flip -> regrid -> set_default_hrir ->
grouped binaural render — cross-checked against the independent numpy
oracle fed the same regridded grid.
"""

import os

import numpy as np
import pytest

import graphaudio_tpu as ga
from graphaudio_tpu.ops.hrtf import load_hrir_grid
from graphaudio_tpu.testing.sofa_fixture import (
    synthetic_hrir_set,
    write_synthetic_sofa,
)

h5py = pytest.importorskip("h5py")

SR = 48000
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "synthetic_hrtf.sofa")


def test_committed_fixture_matches_generator(tmp_path):
    """tests/fixtures/synthetic_hrtf.sofa IS the generator's output (same
    seed) — regenerate with python -m graphaudio_tpu.testing.sofa_fixture."""
    p = tmp_path / "regen.sofa"
    write_synthetic_sofa(p)
    with h5py.File(FIXTURE, "r") as a, h5py.File(p, "r") as b:
        np.testing.assert_array_equal(
            np.asarray(a["Data.IR"]), np.asarray(b["Data.IR"])
        )
        np.testing.assert_array_equal(
            np.asarray(a["SourcePosition"]), np.asarray(b["SourcePosition"])
        )


def test_sofa_load_exact_at_measurement_directions():
    """The HDF5 branch of load_hrir_grid reproduces each measured HRIR
    exactly at grid nodes that coincide with measurement directions."""
    hrirs, az_deg, el_deg = synthetic_hrir_set()
    n_az, n_el = 24, 13
    grid = load_hrir_grid(FIXTURE, SR, n_azimuth=n_az, n_elevation=n_el)
    assert grid.shape == (n_el, n_az, 2, 64)
    hits = 0
    for m in range(len(az_deg)):
        # Grid azimuth is CLOCKWISE; SOFA's is counterclockwise.
        ai = (-az_deg[m]) % 360.0 / (360.0 / n_az)
        ei = (el_deg[m] + 90.0) / (180.0 / (n_el - 1))
        if abs(ai - round(ai)) < 1e-9 and abs(ei - round(ei)) < 1e-9:
            got = grid[int(round(ei)) % n_el, int(round(ai)) % n_az]
            np.testing.assert_allclose(got, hrirs[m], atol=1e-6)
            hits += 1
    # The Fibonacci sphere rarely lands exactly on grid nodes; exactness
    # is separately pinned by test_spatial's dict-based set. Interpolation
    # sanity: grid energy bracketed by measurement energies.
    e = np.sum(grid.astype(np.float64) ** 2, axis=(2, 3))
    me = np.sum(hrirs.astype(np.float64) ** 2, axis=(1, 2))
    assert e.max() <= me.max() * 1.001 and e.min() >= 0.0


def test_sofa_default_hrir_render_matches_oracle(rng):
    """End-to-end: set_default_hrir(SOFA) -> grouped spatial render vs the
    numpy oracle running the SAME regridded grid through its independent
    time-domain implementation."""
    from graphaudio_tpu.testing.oracle import (
        OracleBufferSource,
        OracleContext,
        OracleSpatialPanner,
    )

    n_az, n_el, voices, frames = 12, 7, 3, 1024
    sigs = [(rng.standard_normal(2048) * 0.2).astype(np.float32)
            for _ in range(voices)]

    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    ctx.set_default_hrir(FIXTURE, n_azimuth=n_az, n_elevation=n_el)
    ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    octx = OracleContext(sample_rate=SR)
    octx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    grid = load_hrir_grid(FIXTURE, SR, n_azimuth=n_az, n_elevation=n_el)

    for v in range(voices):
        ang = 2 * np.pi * v / voices + 0.3
        for api in ("ga", "oracle"):
            if api == "ga":
                src = ga.AudioBufferSourceNode(ctx)
                src.buffer = ga.PlayableAudioBuffer.from_mono_array(
                    sigs[v], SR
                )
                pan = ga.SpatialPannerNode(ctx)
                c = ctx
            else:
                src = OracleBufferSource(octx)
                src.set_buffer(sigs[v], SR)
                pan = OracleSpatialPanner(octx, grid)
                c = octx
            src.loop = True
            pan.position_x.value = 2.0 * np.cos(ang)
            pan.position_y.value = 0.4 * (v - 1)
            pan.position_z.value = 2.0 * np.sin(ang)
            src.connect(pan).connect(c.destination)
            src.start(0)

    got = np.asarray(ctx.render(frames))
    want = octx.render(frames)
    # Skip the oracle's documented first-block channel-count transient.
    assert np.max(np.abs(got[:, 128:] - want[:, 128:])) < 1e-5
    # The measured path really differs from the analytic default.
    ref = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    ref.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    src = ga.AudioBufferSourceNode(ref)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(sigs[0], SR)
    src.loop = True
    pan = ga.SpatialPannerNode(ref)
    pan.position_x.value = 2.0 * np.cos(0.3)
    pan.position_z.value = 2.0 * np.sin(0.3)
    src.connect(pan).connect(ref.destination)
    src.start(0)
    analytic = np.asarray(ref.render(frames))
    single = np.asarray(_single_voice_with_default(ctx, sigs[0], frames))
    assert np.max(np.abs(single - analytic)) > 1e-3


def _single_voice_with_default(tuned_ctx, sig, frames):
    """One voice under the SAME measured default as tuned_ctx."""
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=2)
    ctx.set_default_hrir(FIXTURE, n_azimuth=12, n_elevation=7)
    ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])
    src = ga.AudioBufferSourceNode(ctx)
    src.buffer = ga.PlayableAudioBuffer.from_mono_array(sig, SR)
    src.loop = True
    pan = ga.SpatialPannerNode(ctx)
    pan.position_x.value = 2.0 * np.cos(0.3)
    pan.position_z.value = 2.0 * np.sin(0.3)
    src.connect(pan).connect(ctx.destination)
    src.start(0)
    return ctx.render(frames)
