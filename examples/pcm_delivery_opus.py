"""Wire-format PCM delivery + Ogg Opus streaming assets.

Demonstrates the production delivery path:
  1. install a measured HRIR set as the CONTEXT default so every spatial
     voice upgrades at once (set_default_hrir — the per-context HRTF the
     reference gets from phonon),
  2. render the scene to interleaved int16 PCM packed ON DEVICE
     (render_pcm16 — 2 bytes/sample cross the device link, the natural
     wire format for sound-card / network delivery),
  3. encode the mix as Ogg Opus (RFC 7845; dlopen'd libopus + libogg) and
     decode it back, verifying the duration bookkeeping.

Run: python examples/pcm_delivery_opus.py [out.opus]
"""

import os
import sys
import tempfile

import numpy as np

import graphaudio_tpu as ga
from graphaudio_tpu.io import AudioDecoder, codec_capabilities, write_opus
from graphaudio_tpu.ops.hrtf import build_hrir_grid

SR = 48000


def synthetic_measured_set():
    """Stand-in for a real SOFA file (zero-egress environment): the analytic
    grid re-packaged through the measured-HRIR import path."""
    grid = build_hrir_grid(SR, n_azimuth=12, n_elevation=5)
    az = np.repeat(np.arange(12) * 30.0, 5)
    el = np.tile(np.linspace(-90, 90, 5), 12)
    hrirs = np.stack(
        [grid[ei, ai] for ai in range(12) for ei in range(5)]
    )
    return {"hrir": hrirs, "azimuth_deg": az, "elevation_deg": el,
            "sample_rate": SR}


def main(out_path=None):
    ctx = ga.OfflineAudioContext(sample_rate=SR, superblock=16)
    ctx.set_default_hrir(synthetic_measured_set())
    ctx.set_listener([0, 0, 0], [0, 0, -1], [0, 1, 0])

    rng = np.random.default_rng(3)
    for v in range(8):
        src = ga.AudioBufferSourceNode(ctx)
        tone = (np.sin(2 * np.pi * 220 * (v + 1) / 8 * np.arange(SR) / SR)
                * np.exp(-np.arange(SR) / (0.3 * SR)) * 0.2)
        src.buffer = ga.PlayableAudioBuffer.from_mono_array(
            (tone + rng.standard_normal(SR) * 0.01).astype(np.float32), SR)
        src.loop = True
        pan = ga.SpatialPannerNode(ctx)
        ang = 2 * np.pi * v / 8
        pan.position_x.value = 4 * np.cos(ang)
        pan.position_z.value = 4 * np.sin(ang)
        src.connect(pan).connect(ctx.destination)
        src.start(0)

    seconds = 2.0
    pcm = ctx.render_pcm16(int(seconds * SR))  # int16, device-packed
    print(f"rendered {pcm.shape[0] // 2} frames as int16 PCM "
          f"({pcm.nbytes} bytes on the wire vs {pcm.shape[0] * 4} as f32)")

    caps = codec_capabilities()
    if not (caps.get("opus") and caps.get("opus_encode")):
        print("opus codec unavailable on this machine; skipping encode")
        return
    out = out_path or os.path.join(tempfile.gettempdir(), "scene.opus")
    planar = (pcm.reshape(-1, 2).T.astype(np.float32) / 32767.0)
    write_opus(out, planar, SR, bitrate_bps=128000)
    with AudioDecoder(out) as dec:
        print(f"wrote {out}: {dec.channels} ch, {dec.frames} frames "
              f"@ {dec.sample_rate} Hz "
              f"({os.path.getsize(out)} bytes compressed)")
        assert dec.frames == planar.shape[1]


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
