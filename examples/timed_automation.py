"""Timed commands: schedule graph edits on the block clock.

The reference drains its command queue at the start of every 128-frame
block (AudioContextBase.cs:272-284); here `post_at(time, fn)` lands a
command at the first not-yet-rendered superblock boundary >= time, and
`render` splits the device scan there — so param edits, source start/stop,
and topology rewires take effect mid-render-call, deterministically.
Build the context with superblock=1 for the reference's exact per-block
granularity.

Run: python examples/timed_automation.py  (writes timed_automation.wav)
"""

import numpy as np

import graphaudio_tpu as ga
from graphaudio_tpu.io import write_wav


def main():
    ctx = ga.OfflineAudioContext(superblock=8)
    osc = ga.OscillatorNode(ctx)
    osc.frequency.value = 220.0
    lp = ga.BiQuadFilterNode(ctx, type=ga.FilterType.LOWPASS)
    lp.frequency.value = 800.0
    osc.connect(lp).connect(ctx.destination)
    osc.start(0)

    # t=1.0: open the filter (param edit)
    ctx.post_at(1.0, lambda c: setattr(lp.frequency, "value", 6000.0))

    # t=2.0: layer a fifth on top (topology edit — recompiles at the
    # boundary; the running oscillator's phase survives the recompile)
    def add_fifth(c):
        o2 = ga.OscillatorNode(c)
        o2.frequency.value = 330.0
        g = ga.GainNode(c)
        g.gain.value = 0.5
        o2.connect(g).connect(lp)
        o2.start(c.current_time)

    ctx.post_at(2.0, add_fifth)

    # t=3.0: stop the root note (the fifth keeps ringing at half gain)
    ctx.post_at(3.0, lambda c: osc.stop(c.current_time))

    audio = ctx.render_seconds(3.5)  # ONE call; edits land mid-render
    write_wav("timed_automation.wav", audio, ctx.sample_rate)
    for t in (0.5, 1.5, 2.5, 3.4):
        seg = audio[0, int((t - 0.1) * ctx.sample_rate):
                    int(t * ctx.sample_rate)]
        print(f"t={t:.1f}s rms={np.sqrt((seg ** 2).mean()):.4f}")


if __name__ == "__main__":
    main()
