"""One entry point for every measurement probe: python -m benchmarks.probe <name>.

Probes are one-off experiments that answered a specific performance
question on the axon TPU; their conclusions (including the dead ends) are
indexed in benchmarks/PROBES.md and their JSON artifacts live under
benchmarks/results/. Run with no arguments to list probes; arguments after
the name pass through to the probe's own CLI.

Measurement discipline shared by all probes (hard-won, see
.claude/skills/verify/SKILL.md): two-length scan differences cancel the
~30 ms per-call link round trip; scan carries must evolve or XLA hoists
the body; operands travel as arguments, not closures; only jax.device_get
truly synchronizes on this backend.
"""

from __future__ import annotations

import runpy
import sys

PROBES = {
    "kernels-config5": (
        "kernels_config5",
        "config-5 hot-stage kernel variants (row gather, HRTF interp/DFT)",
    ),
    "hrtf-fir-pallas": (
        "hrtf_fir_pallas",
        "time-domain HRTF FIR, augmented-complex DFT, Pallas attempts",
    ),
    "unity-source-overhead": (
        "unity_source_overhead",
        "where the unity buffer-source group's 0.18 ms/step goes",
    ),
    "conv-dft-chain": (
        "conv_dft_chain",
        "superblock convolver op-chain latency (transpose-free DFT)",
    ),
    "superblock-sweep": (
        "superblock_sweep",
        "config-5 xrt_compute vs superblock size",
    ),
    "biquad-scan-rounds": (
        "biquad_scan_rounds",
        "associative-scan round count vs first-order solve variants",
    ),
    "conv-subblock-dft": (
        "conv_subblock_dft",
        "sub-blocked batched-DFT partitioned convolution grain",
    ),
    "hrtf-dft-precision": (
        "hrtf_dft_precision",
        "HRTF DFT matmul precision (HIGHEST vs HIGH) vs oracle budget",
    ),
    "hrtf-stage-breakdown": (
        "hrtf_stage_breakdown",
        "HRTF stage decomposition: spectra interp vs OLA FIR",
    ),
    "hrir-interp-selection": (
        "hrir_interp_selection",
        "exact cheap-precision HRIR interp via {0,1} selection matmuls",
    ),
    "wall-breakdown": (
        "wall_breakdown",
        "flagship render wall decomposition (prep/dispatch/transfer)",
    ),
    "adpcm-chunk-sched": (
        "adpcm_chunk_sched",
        "launch-chunk schedule re-sweep at the ADPCM wire size",
    ),
    "link-semantics": (
        "link_semantics",
        "can device->host copies overlap queued compute at all?",
    ),
    "steady-chunk-sched": (
        "steady_chunk_sched",
        "launch-chunk schedule at the STEADY (4-min) render length",
    ),
    "steady-len": (
        "steady_len",
        "steady-render LENGTH sweep (per-call overhead amortization)",
    ),
}


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help", "list"):
        print(__doc__)
        print("probes:")
        for name, (_mod, desc) in PROBES.items():
            print(f"  {name:24s} {desc}")
        return 0
    name = sys.argv[1]
    entry = PROBES.get(name)
    if entry is None:
        print(f"unknown probe {name!r}; run with no arguments to list",
              file=sys.stderr)
        return 2
    sys.argv = [f"benchmarks.probes.{entry[0]}"] + sys.argv[2:]
    runpy.run_module(f"benchmarks.probes.{entry[0]}", run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
