"""Committed-benchmark artifact writer: ONE implementation of the
provenance rule (every number quoted in the README cites a committed
artifact measured on the real device — CPU-only runs must never overwrite
TPU evidence)."""

import json
import os

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def clean_breakdown(bd: dict) -> dict:
    """Compress a RenderStats breakdown for a committed artifact: round
    floats, drop the verbose per-chunk lists. One shared implementation so
    bench.py and every probe emit the same artifact format."""
    return {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in bd.items()
        if not k.startswith("chunk_")
    }


def write_artifact(name: str, results) -> bool:
    """Write results/<name>.json iff this process is running on the real
    accelerator. Returns True when written."""
    import jax

    if jax.devices()[0].platform == "cpu":
        return False
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(os.path.join(RESULTS_DIR, name + ".json"), "w") as f:
        json.dump(results, f, indent=1)
    return True
