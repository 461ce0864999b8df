"""Build-on-demand loader for the native C++ helpers.

The shared objects are NOT committed to the repo (git does not preserve
mtimes, so a checked-in .so can silently shadow newer sources after a
clone). Instead each library builds into ``native/build/`` under a name
derived from a hash of its source, so the binary on disk can never be
stale with respect to the source that should have produced it: a source
edit changes the hash, which forces a rebuild.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
from typing import List, Optional


def _loads(so_path: str) -> bool:
    """True when the shared object resolves against THIS machine's libraries
    (dlopen is refcounted, so the caller's own CDLL afterwards is free)."""
    import ctypes

    try:
        ctypes.CDLL(so_path)
        return True
    except OSError:
        return False


def load_or_build(src_path: str, extra_flags: Optional[List[str]] = None) -> Optional[str]:
    """Return the path of an up-to-date shared object for ``src_path``.

    Builds with g++ when the hash-named artifact is missing; returns None
    when the source is absent or the build fails (callers fall back to
    pure-Python implementations).
    """
    if not os.path.exists(src_path):
        return None
    with open(src_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    name = os.path.splitext(os.path.basename(src_path))[0]
    build_dir = os.path.join(os.path.dirname(src_path), "build")
    so_path = os.path.join(build_dir, f"lib{name}-{digest}.so")
    if os.path.exists(so_path):
        # The source hash can't see the link environment: an artifact built
        # on another machine may reference versioned symbols this machine's
        # system libraries don't provide (e.g. @LIBAVUTIL_58 vs .57).
        # Verify it actually dlopens; rebuild in place when it doesn't.
        if _loads(so_path):
            return so_path
        try:
            os.remove(so_path)
        except OSError:
            # Lost a removal race (or unwritable file): fall through to the
            # rebuild anyway — it writes a tmp file and os.replace()s over
            # whatever is there.
            pass
    os.makedirs(build_dir, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    try:
        subprocess.run(
            # Link flags AFTER the source: with ld's --as-needed default,
            # -lfoo before the object that references it gets discarded.
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, src_path,
             *(extra_flags or [])],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so_path)  # atomic: concurrent builders race safely
    except Exception:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
        return None
    return so_path
