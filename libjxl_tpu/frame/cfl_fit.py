"""Encoder chroma-from-luma fitting (fast path).

Reference: enc_chroma_from_luma.cc FindBestMultiplier (fast branch) +
ComputeTile: per 64x64 tile, least squares of chroma against luma over
inverse-quant-weighted AC coefficients, with a towards-zero shrink.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.vardct.cfl import DEFAULT_COLOR_FACTOR

K_YTOB_BASE = 1.0  # cms kYToBRatio


def _find_best_multiplier(vm: np.ndarray, vs: np.ndarray, base: float,
                          distance_mul: float) -> int:
    """FindBestMultiplier fast branch (enc_chroma_from_luma.cc:133-151)."""
    num = vm.size
    if num == 0:
        return 0
    a = vm / DEFAULT_COLOR_FACTOR
    b = base * vm - vs
    ca = np.sum(a * a)
    cb = np.sum(a * b)
    x = -cb / (ca + num * distance_mul * 0.5)
    towards_zero = 2.6
    if x >= towards_zero:
        x -= towards_zero
    elif x <= -towards_zero:
        x += towards_zero
    else:
        x = 0.0
    return int(np.clip(round(x), -128, 127))


def fit_cfl_maps(coeffs: np.ndarray, inv_table: np.ndarray,
                 raw_quant: np.ndarray, quant_scale: float
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Per-64x64-tile ytox/ytob maps from 8x8 DCT coefficients.

    coeffs: (3, BY, BX, 64) float DCT coefficients.
    inv_table: (3, 64) inverse dequant weights.
    raw_quant: (BY, BX) int. quant_scale: quantizer Scale().
    Returns (ytox_map, ytob_map) int32 (ceil(BY/8), ceil(BX/8)).
    """
    _, by, bx, _ = coeffs.shape
    ty, tx = (by + 7) // 8, (bx + 7) // 8
    ytox = np.zeros((ty, tx), np.int32)
    ytob = np.zeros((ty, tx), np.int32)
    k_distance_mul_ac = 1e-9
    k_strange = 128.0
    ac = coeffs.copy()
    ac[..., 0] = 0.0  # zero LLF
    q = quant_scale * k_strange * raw_quant.astype(np.float64)
    for t_y in range(ty):
        for t_x in range(tx):
            sl = (slice(t_y * 8, min((t_y + 1) * 8, by)),
                  slice(t_x * 8, min((t_x + 1) * 8, bx)))
            qtile = q[sl][..., None]
            wy_x = (ac[1][sl] * inv_table[0] * qtile).ravel()
            wx = (ac[0][sl] * inv_table[0] * qtile).ravel()
            wy_b = (ac[1][sl] * inv_table[2] * qtile).ravel()
            wb = (ac[2][sl] * inv_table[2] * qtile).ravel()
            ytox[t_y, t_x] = _find_best_multiplier(
                wy_x, wx, 0.0, k_distance_mul_ac)
            ytob[t_y, t_x] = _find_best_multiplier(
                wy_b, wb, K_YTOB_BASE, k_distance_mul_ac)
    return ytox, ytob
