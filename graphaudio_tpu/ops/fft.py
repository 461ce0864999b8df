"""Real DFT as MXU matmuls.

The axon TPU backend implements neither ``jnp.fft.*`` nor complex64
arithmetic on the host-transfer path (probed empirically: both raise
UNIMPLEMENTED). For the partitioned convolver's 256-point transforms a
matmul-form DFT is the right call anyway: a [S,128] x [128,129] contraction
per superblock lands directly on the MXU systolic array, is batched across
quanta/voices, and at this size costs about the same as a radix-2 FFT while
avoiding its lane-hostile butterflies.

All spectra are carried as split real/imag float32 pairs; matmuls run at
``Precision.HIGHEST`` (f32-accurate on TPU; default bf16 passes lose ~1e-1
absolute on DFT magnitudes).

Parity note: replaces the reference's vendored Ooura rdft
(GraphAudio.Core/FftFlat/RealFourierTransform.cs:62-131) — forward real
transform to 129 bins and 2/N-scaled inverse.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def rfft_basis(n_in: int, fft_size: int):
    """DFT basis for the first ``n_in`` (nonzero) samples of an ``fft_size``
    transform. Returns (Cr, Ci): f32[n_in, fft_size//2+1]."""
    bins = fft_size // 2 + 1
    k = np.arange(n_in, dtype=np.float64)[:, None]
    b = np.arange(bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * k * b / fft_size
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def irfft_basis(fft_size: int):
    """Inverse real DFT basis. Returns (Br, Bi): f32[fft_size//2+1, fft_size]
    such that y = R @ Br + I @ Bi reconstructs the irfft."""
    bins = fft_size // 2 + 1
    b = np.arange(bins, dtype=np.float64)[:, None]
    n = np.arange(fft_size, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * b * n / fft_size
    w = np.full((bins, 1), 2.0)
    w[0] = 1.0
    if fft_size % 2 == 0:
        w[-1] = 1.0
    br = (w * np.cos(ang) / fft_size).astype(np.float32)
    bi = (-w * np.sin(ang) / fft_size).astype(np.float32)
    return br, bi


class RealDft:
    """Cached matmul-DFT for one (n_in, fft_size) geometry."""

    _cache = {}

    def __new__(cls, n_in: int, fft_size: int):
        key = (n_in, fft_size)
        inst = cls._cache.get(key)
        if inst is None:
            inst = super().__new__(cls)
            inst.n_in = n_in
            inst.fft_size = fft_size
            cr, ci = rfft_basis(n_in, fft_size)
            br, bi = irfft_basis(fft_size)
            inst._cr, inst._ci = cr, ci
            inst._br, inst._bi = br, bi
            cls._cache[key] = inst
        return inst

    def forward(self, x):
        """x: f32[..., n_in] (implicitly zero-padded to fft_size).
        Returns (R, I): f32[..., bins]."""
        cr = jnp.asarray(self._cr)
        ci = jnp.asarray(self._ci)
        r = jnp.matmul(x, cr, precision=_HIGHEST)
        i = jnp.matmul(x, ci, precision=_HIGHEST)
        return r, i

    def inverse(self, r, i):
        """Returns f32[..., fft_size]."""
        br = jnp.asarray(self._br)
        bi = jnp.asarray(self._bi)
        return jnp.matmul(r, br, precision=_HIGHEST) + jnp.matmul(
            i, bi, precision=_HIGHEST
        )
