"""Zigzag signed<->unsigned packing (reference: lib/jxl/pack_signed.h).

X>=0 -> 2X, negative -X -> 2X-1. Provided as scalars and as
numpy-vectorized forms for modular residual planes.
"""

from __future__ import annotations

import numpy as np


def pack_signed(v: int) -> int:
    return 2 * v if v >= 0 else -2 * v - 1


def unpack_signed(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def pack_signed_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return np.where(v >= 0, 2 * v, -2 * v - 1)


def unpack_signed_np(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.int64)
    return np.where(u & 1 == 0, u >> 1, -((u + 1) >> 1))
