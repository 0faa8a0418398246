"""Adaptive DC smoothing (decoder side).

Reference: lib/jxl/compressed_dc.cc:50-199 — 3x3 weighted smoothing
applied where the smoothed value stays within ~half a DC quantization
step of the original in every channel.
"""

from __future__ import annotations

import numpy as np

_W1 = 0.20345139757231578
_W2 = 0.0334829185968739
_W0 = 1.0 - 4.0 * (_W1 + _W2)


def adaptive_dc_smoothing(dc: np.ndarray, dc_factors: np.ndarray
                          ) -> np.ndarray:
    """dc: (3, H, W) dequantized DC -> smoothed copy."""
    _, h, w = dc.shape
    if h <= 2 or w <= 2:
        return dc
    out = dc.copy()
    pad = np.pad(dc, ((0, 0), (1, 1), (1, 1)), mode="edge")
    c0 = pad[:, :-2, :-2] + pad[:, :-2, 2:] + pad[:, 2:, :-2] + pad[:, 2:, 2:]
    s0 = pad[:, 1:-1, :-2] + pad[:, 1:-1, 2:] + pad[:, :-2, 1:-1] \
        + pad[:, 2:, 1:-1]
    sm = c0 * _W2 + s0 * _W1 + dc * _W0
    gap = np.maximum(
        0.5, np.abs((dc - sm) / dc_factors[:, None, None]).max(axis=0))
    factor = np.maximum(3.0 - 4.0 * gap, 0.0)
    smoothed = dc + (sm - dc) * factor[None]
    out[:, 1:-1, 1:-1] = smoothed[:, 1:-1, 1:-1]
    return out
