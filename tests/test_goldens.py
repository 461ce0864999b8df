"""Regression goldens: short renders of the benchmark configs.

Runs compare bit-for-sample against committed tests/goldens/*.npz, guarding
every kernel against silent behavioral drift. Re-baselining requires the
EXPLICIT ``GA_WRITE_GOLDENS=1`` — a missing golden otherwise FAILS (a
deleted-goldens checkout must not silently re-baseline from the current
renderer; semantics are independently pinned by the numpy oracle tests).
"""

import os

import numpy as np
import pytest

from benchmarks.configs import CONFIGS

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
FRAMES = 8192


@pytest.mark.parametrize("n", sorted(CONFIGS))
def test_config_golden(n):
    name, builder = CONFIGS[n]
    ctx = builder(superblock=4)
    out = ctx.render(FRAMES)
    assert np.isfinite(out).all()
    path = os.path.join(GOLDEN_DIR, f"config{n}_{name}.npz")
    if not os.path.exists(path):
        if os.environ.get("GA_WRITE_GOLDENS") != "1":
            pytest.fail(
                f"golden missing: {path} — refusing to self-baseline; "
                "run with GA_WRITE_GOLDENS=1 to (re)write goldens"
            )
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, out=out)
        pytest.skip(f"golden written: {path}")
    golden = np.load(path)["out"]
    assert golden.shape == out.shape
    err = np.max(np.abs(out.astype(np.float64) - golden.astype(np.float64)))
    # Bitwise stability is expected on the same backend; allow microscopic
    # drift from compiler version changes.
    assert err < 1e-6, f"config {n} drifted from golden by {err}"
