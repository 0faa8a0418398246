"""AC strategies: the 27 transform types and their geometry/orders.

Reference: lib/jxl/ac_strategy.{h,cc} (type enum, covered-block LUTs,
natural "zig-zag" coefficient order generalized to rectangles),
lib/jxl/coeff_order.h (kStrategyOrder buckets, kCoeffOrderOffset).
"""

from __future__ import annotations

import functools

import numpy as np

BLOCK_DIM = 8
DCT_BLOCK_SIZE = 64

# AcStrategyType (ac_strategy.h:35-79)
DCT8X8 = 0
IDENTITY = 1
DCT2X2 = 2
DCT4X4 = 3
DCT16X16 = 4
DCT32X32 = 5
DCT16X8 = 6
DCT8X16 = 7
DCT32X8 = 8
DCT8X32 = 9
DCT32X16 = 10
DCT16X32 = 11
DCT4X8 = 12
DCT8X4 = 13
AFV0 = 14
AFV1 = 15
AFV2 = 16
AFV3 = 17
DCT64X64 = 18
DCT64X32 = 19
DCT32X64 = 20
DCT128X128 = 21
DCT128X64 = 22
DCT64X128 = 23
DCT256X256 = 24
DCT256X128 = 25
DCT128X256 = 26

NUM_STRATEGIES = 27

# ac_strategy.h:148-173
COVERED_X = [1, 1, 1, 1, 2, 4, 1, 2, 1, 4, 2, 4, 1, 1, 1, 1, 1, 1,
             8, 4, 8, 16, 8, 16, 32, 16, 32]
COVERED_Y = [1, 1, 1, 1, 2, 4, 2, 1, 4, 1, 4, 2, 1, 1, 1, 1, 1, 1,
             8, 8, 4, 16, 16, 8, 32, 32, 16]

# coeff_order.h:44 — order bucket per strategy (13 buckets).
STRATEGY_ORDER = [0, 1, 1, 1, 2, 3, 4, 4, 5, 5, 6, 6, 1, 1,
                  1, 1, 1, 1, 7, 8, 8, 9, 10, 10, 11, 12, 12]
NUM_ORDERS = 13

# quant_weights.h:337 — quant table per strategy (17 tables).
STRATEGY_QUANT_TABLE = [0, 1, 2, 3, 4, 5, 6, 6, 7, 7, 8, 8, 9, 9,
                        10, 10, 10, 10, 11, 12, 12, 13, 14, 14, 15, 16, 16]
NUM_QUANT_TABLES = 17
QUANT_TABLE_SIZE_X = [1, 1, 1, 1, 2, 4, 1, 1, 2, 1, 1, 8, 4, 16, 8, 32, 16]
QUANT_TABLE_SIZE_Y = [1, 1, 1, 1, 2, 4, 2, 4, 4, 1, 1, 8, 8, 16, 16, 32, 32]

# coeff_order.h:28-34: offsets (in units of 64 coeffs) into the
# order array, per (order bucket, channel).
COEFF_ORDER_OFFSET = [
    0, 1, 2, 3, 4, 5, 6, 10, 14, 18, 34, 50, 66, 68, 70, 72, 76, 80,
    84, 92, 100, 108, 172, 236, 300, 332, 364, 396, 652, 908, 1164,
    1292, 1420, 1548, 2572, 3596, 4620, 5132, 5644, 6156]
COEFF_ORDER_MAX_SIZE = 6156 * 64


def coeff_order_offset(order_bucket: int, channel: int) -> int:
    return COEFF_ORDER_OFFSET[3 * order_bucket + channel] * DCT_BLOCK_SIZE


def coeff_order_size(order_bucket: int) -> int:
    """Number of coefficients for one channel of this order bucket."""
    return (COEFF_ORDER_OFFSET[3 * order_bucket + 1]
            - COEFF_ORDER_OFFSET[3 * order_bucket]) * DCT_BLOCK_SIZE


def covered_blocks(strategy: int) -> tuple[int, int]:
    """(cx, cy) covered 8x8 blocks."""
    return COVERED_X[strategy], COVERED_Y[strategy]


def log2_covered_blocks(strategy: int) -> int:
    return (COVERED_X[strategy] * COVERED_Y[strategy]).bit_length() - 1


def coefficient_layout(cy: int, cx: int) -> tuple[int, int]:
    """Coefficients are stored with the wider side along x
    (ac_strategy.h CoefficientLayout: ensures cx >= cy)."""
    if cy > cx:
        return cx, cy
    return cy, cx


def is_valid_strategy(raw: int) -> bool:
    return 0 <= raw < NUM_STRATEGIES


@functools.lru_cache(maxsize=None)
def natural_coeff_order(strategy: int) -> np.ndarray:
    """Generalized zig-zag order (ac_strategy.cc:29-80).

    Returns order[] such that order[k] is the linear index (in the
    row-major coefficient array of shape (cy*8, cx*8) after
    coefficient_layout) of the k-th coefficient in natural order.
    The first cx*cy entries are the LLF positions.
    """
    cx, cy = covered_blocks(strategy)
    cy, cx = coefficient_layout(cy, cx)
    out = np.zeros(cx * cy * DCT_BLOCK_SIZE, np.int32)
    xs = cx // cy
    xsm = xs - 1
    xss = xs.bit_length() - 1
    cur = cx * cy
    for i in range(cx * BLOCK_DIM):
        for j in range(i + 1):
            x, y = j, i - j
            if i % 2:
                x, y = y, x
            if y & xsm:
                continue
            y >>= xss
            if x < cx and y < cy:
                val = y * cx + x
            else:
                val = cur
                cur += 1
            out[val] = y * cx * BLOCK_DIM + x
    for ip in range(cx * BLOCK_DIM - 1, 0, -1):
        i = ip - 1
        for j in range(i + 1):
            x = cx * BLOCK_DIM - 1 - (i - j)
            y = cx * BLOCK_DIM - 1 - j
            if i % 2:
                x, y = y, x
            if y & xsm:
                continue
            y >>= xss
            out[cur] = y * cx * BLOCK_DIM + x
            cur += 1
    assert cur == cx * cy * DCT_BLOCK_SIZE
    return out
