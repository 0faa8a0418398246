"""DCT core: spec-convention DCT/IDCT matrices and 2D transforms.

Reference: lib/jxl/dct-inl.h (split-radix implementation),
dct_for_test.h (the naive spec definition both must match),
dct_scales.h (resample scales for DC <-> LLF embedding).

Convention ("divided by sqrt(N)", dct_for_test.h:22-43):
  DCT_N[u] = alpha(u) * sqrt(2)/N * sum_y cos((y+0.5) u pi / N) p[y]
  IDCT_N[y] = sqrt(2) * sum_u alpha(u) cos((y+0.5) u pi / N) c[u]
so the DC coefficient equals the mean of the samples. On TPU these are
plain matmuls (ops/dct.py batches them onto the MXU); here numpy
float32/64 for the host/reference path.
"""

from __future__ import annotations

import functools

import numpy as np

BLOCK_DIM = 8


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """M[u, y]: forward DCT matrix, spec scaling (float64)."""
    u = np.arange(n)[:, None]
    y = np.arange(n)[None, :]
    m = np.cos((y + 0.5) * u * np.pi / n) * (np.sqrt(2.0) / n)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


@functools.lru_cache(maxsize=None)
def idct_matrix(n: int) -> np.ndarray:
    """I[y, u]: inverse DCT matrix; I @ M == identity."""
    u = np.arange(n)[None, :]
    y = np.arange(n)[:, None]
    m = np.cos((y + 0.5) * u * np.pi / n) * np.sqrt(2.0)
    m[:, 0] *= 1.0 / np.sqrt(2.0)
    return m


def dct2d(pixels: np.ndarray) -> np.ndarray:
    """2D DCT of an (H, W) block -> (H, W) coefficients (vfreq, hfreq)."""
    h, w = pixels.shape
    return dct_matrix(h) @ pixels @ dct_matrix(w).T


def idct2d(coeffs: np.ndarray) -> np.ndarray:
    h, w = coeffs.shape
    return idct_matrix(h) @ coeffs @ idct_matrix(w).T


@functools.lru_cache(maxsize=None)
def resample_scales(n: int, m: int) -> np.ndarray:
    """DCTResampleScales<m, n>-style factors for embedding an n-point
    DCT into the first n coefficients of an m-point DCT (dct_scales.h).

    For m > n (e.g. scales<8N -> N>): r(k) = sin(pi k/2n)/(L sin(pi k/2m))
    with L = m/n; k=0 -> 1. For m < n the inverse factors.
    """
    if n == m:
        return np.ones(n)
    if n < m:
        # Embedding an n-point signal into an m-point block (LLF from
        # DC) uses the UPsampling scales DCTResampleScales<n, m> — the
        # reciprocals of the sin-ratio (dct_scales.h:47-120, verified
        # against kScales<4,32> = {1, 1.02576, 1.10894, 1.27056}).
        k = np.arange(n)
        L = m // n
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.sin(np.pi * k / (2 * n)) / (L * np.sin(np.pi * k / (2 * m)))
        r[0] = 1.0
        return 1.0 / r
    # Downsampling direction (DC from LLF, encoder side).
    return 1.0 / resample_scales(m, n)


def llf_from_dc(dc: np.ndarray, full_h: int, full_w: int) -> np.ndarray:
    """LowestFrequenciesFromDC (dec_transforms-inl.h:691).

    dc: (cy, cx) DC values of the covered 8x8 blocks; returns the
    (cy, cx) lowest-frequency coefficients of the (full_h, full_w)
    transform (already in coefficient-layout orientation handled by the
    caller)."""
    cy, cx = dc.shape
    coef = dct2d(dc)
    sy = resample_scales(cy, full_h)
    sx = resample_scales(cx, full_w)
    return coef * sy[:, None] * sx[None, :]


def dc_from_llf(llf: np.ndarray, full_h: int, full_w: int) -> np.ndarray:
    """Inverse of llf_from_dc (enc_transforms DCFromLowestFrequencies)."""
    cy, cx = llf.shape
    sy = resample_scales(cy, full_h)
    sx = resample_scales(cx, full_w)
    return idct2d(llf / (sy[:, None] * sx[None, :]))
