"""VarDCT reconstruction: dequant + CfL + LLF-from-DC + IDCT.

Reference: lib/jxl/dec_group.cc (DequantBlock/DequantLane),
dec_transforms-inl.h (TransformToPixels, LowestFrequenciesFromDC).
Numpy reference path; the batched TPU path lives in ops/decode_tpu.py.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.base.errors import UnsupportedError
from libjxl_tpu.color.constants import DEFAULT_QUANT_BIAS
from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct.dct import (
    dc_from_llf, dct2d, idct2d, llf_from_dc, dct_matrix, idct_matrix,
)
from libjxl_tpu.vardct.group import CoeffBlock
from libjxl_tpu.vardct.quantizer import Quantizer, adjust_quant_bias


def x_qm_multiplier(x_qm_scale: int) -> float:
    """passes_state.cc: pow(1.25, x_qm_scale - 2)."""
    return 1.25 ** (x_qm_scale - 2)


def b_qm_multiplier(b_qm_scale: int) -> float:
    return 1.25 ** (b_qm_scale - 2)


def transform_to_pixels(strategy: int, coeffs: np.ndarray) -> np.ndarray:
    """coeffs: (size,) float in coefficient layout -> (8cy, 8cx) pixels.

    Reference dec_transforms-inl.h TransformToPixels. Currently the
    full strategy set: DCT family, IDENTITY, DCT2X2, DCT4X4,
    DCT4X8/8X4 and AFV0-3.
    """
    cx, cy = acs.covered_blocks(strategy)
    ly, lx = acs.coefficient_layout(cy, cx)
    h, w = cy * 8, cx * 8
    grid = coeffs.reshape(ly * 8, lx * 8)
    if strategy == acs.IDENTITY:
        # dec_transforms-inl.h IDENTITY: 2x2 "DC" + residuals per 4x4.
        return _identity_to_pixels(grid)
    if strategy == acs.DCT2X2:
        return _dct2_to_pixels(grid)
    if strategy == acs.DCT4X4:
        return _dct4x4_to_pixels(grid)
    if strategy in (acs.DCT4X8, acs.DCT8X4):
        return _dct4x8_to_pixels(grid, horizontal=strategy == acs.DCT4X8)
    if strategy in (acs.AFV0, acs.AFV1, acs.AFV2, acs.AFV3):
        return _afv_to_pixels(grid, strategy - acs.AFV0)
    # Plain DCT: the stored coefficient grid is the transpose of the
    # natural (vfreq, hfreq) layout whenever ROWS >= COLS — including
    # square blocks (dct-inl.h:351-371 ComputeScaledDCT skips the final
    # transpose in the ROWS >= COLS branch).
    if cy >= cx:
        grid = grid.T
    return idct2d(grid)


def transform_from_pixels(strategy: int, pixels: np.ndarray) -> np.ndarray:
    """(8cy, 8cx) pixels -> (size,) coefficients in layout order."""
    cx, cy = acs.covered_blocks(strategy)
    if strategy == acs.IDENTITY:
        return _identity_from_pixels(pixels).ravel()
    if strategy == acs.DCT2X2:
        return _dct2_from_pixels(pixels).ravel()
    if strategy == acs.DCT4X4:
        return _dct4x4_from_pixels(pixels).ravel()
    if strategy in (acs.DCT4X8, acs.DCT8X4):
        return _dct4x8_from_pixels(
            pixels, horizontal=strategy == acs.DCT4X8).ravel()
    if strategy in (acs.AFV0, acs.AFV1, acs.AFV2, acs.AFV3):
        return _afv_from_pixels(pixels, strategy - acs.AFV0).ravel()
    coef = dct2d(pixels)
    if cy >= cx:
        coef = coef.T
    return coef.ravel()


# -- special 8x8-class transforms (dec_transforms-inl.h:463-581) -----------
#
# The four sub-block DCs are Hadamard-combined into coefficient slots
# [0],[1],[8],[9] (or [0],[8] for the 2-sub-block 4x8/8x4); sub-block AC
# coefficients are interleaved by 2 with offset (y, x).


def _dct2_to_pixels(grid: np.ndarray) -> np.ndarray:
    """DCT2X2: three levels of 2x2 butterflies (IDCT2TopBlock<2,4,8>)."""
    out = grid.astype(np.float64).copy()
    for s in (2, 4, 8):
        num = s // 2
        c00 = out[:num, :num].copy()
        c01 = out[:num, num:s].copy()
        c10 = out[num:s, :num].copy()
        c11 = out[num:s, num:s].copy()
        tmp = np.zeros((s, s))
        tmp[0::2, 0::2] = c00 + c01 + c10 + c11
        tmp[0::2, 1::2] = c00 + c01 - c10 - c11
        tmp[1::2, 0::2] = c00 - c01 + c10 - c11
        tmp[1::2, 1::2] = c00 - c01 - c10 + c11
        out[:s, :s] = tmp
    return out


def _dct2_from_pixels(pixels: np.ndarray) -> np.ndarray:
    out = pixels.astype(np.float64).copy()
    for s in (8, 4, 2):
        num = s // 2
        p = out[:s, :s]
        p00 = p[0::2, 0::2].copy()
        p01 = p[0::2, 1::2].copy()
        p10 = p[1::2, 0::2].copy()
        p11 = p[1::2, 1::2].copy()
        out[:num, :num] = 0.25 * (p00 + p01 + p10 + p11)
        out[:num, num:s] = 0.25 * (p00 + p01 - p10 - p11)
        out[num:s, :num] = 0.25 * (p00 - p01 + p10 - p11)
        out[num:s, num:s] = 0.25 * (p00 - p01 - p10 + p11)
    return out


def _hadamard4(b00, b01, b10, b11):
    return (b00 + b01 + b10 + b11, b00 + b01 - b10 - b11,
            b00 - b01 + b10 - b11, b00 - b01 - b10 + b11)


def _identity_to_pixels(grid: np.ndarray) -> np.ndarray:
    """IDENTITY (dec_transforms-inl.h:463-499)."""
    dcs = _hadamard4(grid[0, 0], grid[0, 1], grid[1, 0], grid[1, 1])
    out = np.zeros((8, 8))
    for y in range(2):
        for x in range(2):
            dc = dcs[y * 2 + x]
            residual_sum = 0.0
            for iy in range(4):
                for ix in range(4):
                    if ix == 0 and iy == 0:
                        continue
                    residual_sum += grid[y + iy * 2, x + ix * 2]
            p11 = dc - residual_sum / 16.0
            out[4 * y + 1, 4 * x + 1] = p11
            for iy in range(4):
                for ix in range(4):
                    if ix == 1 and iy == 1:
                        continue
                    out[y * 4 + iy, x * 4 + ix] = \
                        grid[y + iy * 2, x + ix * 2] + p11
            out[y * 4, x * 4] = grid[y + 2, x + 2] + p11
    return out


def _identity_from_pixels(pixels: np.ndarray) -> np.ndarray:
    grid = np.zeros((8, 8))
    dcs = []
    for y in range(2):
        for x in range(2):
            quad = pixels[y * 4:y * 4 + 4, x * 4:x * 4 + 4]
            dc = quad.mean()
            dcs.append(dc)
            p11 = quad[1, 1]
            for iy in range(4):
                for ix in range(4):
                    if iy == 0 and ix == 0:
                        continue
                    if iy == 1 and ix == 1:
                        grid[y + iy * 2, x + ix * 2] = quad[0, 0] - p11
                    else:
                        grid[y + iy * 2, x + ix * 2] = quad[iy, ix] - p11
    # Inverse of the decode Hadamard (which is its own inverse / 4).
    grid[0, 0] = (dcs[0] + dcs[1] + dcs[2] + dcs[3]) / 4.0
    grid[0, 1] = (dcs[0] + dcs[1] - dcs[2] - dcs[3]) / 4.0
    grid[1, 0] = (dcs[0] - dcs[1] + dcs[2] - dcs[3]) / 4.0
    grid[1, 1] = (dcs[0] - dcs[1] - dcs[2] + dcs[3]) / 4.0
    return grid


def _dct4x4_to_pixels(grid: np.ndarray) -> np.ndarray:
    """DCT4X4 (dec_transforms-inl.h:541-568)."""
    dcs = _hadamard4(grid[0, 0], grid[0, 1], grid[1, 0], grid[1, 1])
    out = np.zeros((8, 8))
    for y in range(2):
        for x in range(2):
            block = np.zeros((4, 4))
            block.flat[0] = dcs[y * 2 + x]
            for iy in range(4):
                for ix in range(4):
                    if ix == 0 and iy == 0:
                        continue
                    block[iy, ix] = grid[y + iy * 2, x + ix * 2]
            # ComputeScaledIDCT<4,4>: square blocks store coefficients
            # TRANSPOSED (same ROWS >= COLS convention as the main DCT
            # family); interop-verified against djxl on forced-DCT4X4
            # streams.
            out[y * 4:y * 4 + 4, x * 4:x * 4 + 4] = idct2d(block.T)
    return out


def _dct4x4_from_pixels(pixels: np.ndarray) -> np.ndarray:
    grid = np.zeros((8, 8))
    dcs = []
    for y in range(2):
        for x in range(2):
            block = dct2d(pixels[y * 4:y * 4 + 4, x * 4:x * 4 + 4]).T
            dcs.append(block[0, 0])
            for iy in range(4):
                for ix in range(4):
                    if ix == 0 and iy == 0:
                        continue
                    grid[y + iy * 2, x + ix * 2] = block[iy, ix]
    grid[0, 0] = (dcs[0] + dcs[1] + dcs[2] + dcs[3]) / 4.0
    grid[0, 1] = (dcs[0] + dcs[1] - dcs[2] - dcs[3]) / 4.0
    grid[1, 0] = (dcs[0] - dcs[1] + dcs[2] - dcs[3]) / 4.0
    grid[1, 1] = (dcs[0] - dcs[1] - dcs[2] + dcs[3]) / 4.0
    return grid


def _dct4x8_to_pixels(grid: np.ndarray, horizontal: bool) -> np.ndarray:
    """DCT4X8 (horizontal=True, two 4-tall x 8-wide halves) / DCT8X4
    (two 8-tall x 4-wide halves). dec_transforms-inl.h:500-540."""
    dc0 = grid[0, 0] + grid[1, 0]
    dc1 = grid[0, 0] - grid[1, 0]
    out = np.zeros((8, 8))
    for half, dc in ((0, dc0), (1, dc1)):
        block = np.zeros((4, 8))
        block[0, 0] = dc
        for iy in range(4):
            for ix in range(8):
                if ix == 0 and iy == 0:
                    continue
                block[iy, ix] = grid[half + iy * 2, ix]
        if horizontal:
            out[half * 4:half * 4 + 4, :] = idct2d(block)
        else:
            # 8-tall x 4-wide half: block holds transposed coefficients
            # (coefficient layout keeps the wider side on x).
            out[:, half * 4:half * 4 + 4] = idct2d(block.T)
    return out


def _dct4x8_from_pixels(pixels: np.ndarray, horizontal: bool) -> np.ndarray:
    grid = np.zeros((8, 8))
    dcs = []
    for half in range(2):
        if horizontal:
            block = dct2d(pixels[half * 4:half * 4 + 4, :])
        else:
            block = dct2d(pixels[:, half * 4:half * 4 + 4]).T
        dcs.append(block[0, 0])
        for iy in range(4):
            for ix in range(8):
                if ix == 0 and iy == 0:
                    continue
                grid[half + iy * 2, ix] = block[iy, ix]
    grid[0, 0] = (dcs[0] + dcs[1]) / 2.0
    grid[1, 0] = (dcs[0] - dcs[1]) / 2.0
    return grid


# -- group reconstruction --------------------------------------------------


def dequant_block(coeffs_q: np.ndarray, strategy: int, quantizer: Quantizer,
                  raw_quant: int, ytox: float, ytob: float,
                  x_qm_mul: float, b_qm_mul: float,
                  biases: np.ndarray = DEFAULT_QUANT_BIAS) -> np.ndarray:
    """DequantBlock (dec_group.cc:155-183): (3, size) int -> float."""
    table = quantizer.dequant.table(strategy)  # (3, ly8, lx8)
    size = coeffs_q.shape[1]
    scaled = quantizer.inv_quant_ac(raw_quant)
    mults = np.array([scaled * x_qm_mul, scaled, scaled * b_qm_mul],
                     np.float32)
    biased = adjust_quant_bias(coeffs_q, biases)
    dq = biased * table.reshape(3, size) * mults[:, None]
    # CfL: X/B get ytox/ytob * dequantized Y added.
    dq[0] += ytox * dq[1]
    dq[2] += ytob * dq[1]
    return dq


def _native_dequant(coeffs, table, scale, fx, fb, x_qm_mul, b_qm_mul,
                    biases):
    """Fused AdjustQuantBias + dequant + CfL (jxl_native.cpp
    dequant_blocks); None when the native module is unavailable.
    coeffs: (n, 3, size) int32; table: (3, size); scale/fx/fb: (n,)."""
    import ctypes as C
    try:
        from libjxl_tpu.native.bindings import get_lib
        lib = get_lib()
    except Exception:
        return None
    if lib is None:
        return None
    if not hasattr(lib, "_deq_bound"):
        F = C.POINTER(C.c_float)
        lib.dequant_blocks.restype = None
        lib.dequant_blocks.argtypes = [
            C.c_int64, C.c_int64, C.POINTER(C.c_int32), F, F, F, F,
            C.c_float, C.c_float, C.POINTER(C.c_double), F]
        lib._deq_bound = True
    n, _, size = coeffs.shape
    cf = np.ascontiguousarray(coeffs, np.int32)
    tb = np.ascontiguousarray(table, np.float32)
    sc = np.ascontiguousarray(scale, np.float32)
    fxa = np.ascontiguousarray(fx, np.float32)
    fba = np.ascontiguousarray(fb, np.float32)
    bs = np.ascontiguousarray(biases, np.float64)
    out = np.empty((n, 3, size), np.float32)

    def fp(a):
        return a.ctypes.data_as(C.POINTER(C.c_float))

    lib.dequant_blocks(n, size,
                       cf.ctypes.data_as(C.POINTER(C.c_int32)),
                       fp(tb), fp(sc), fp(fxa), fp(fba),
                       float(x_qm_mul), float(b_qm_mul),
                       bs.ctypes.data_as(C.POINTER(C.c_double)),
                       fp(out))
    return out


def reconstruct_group_dct8(blocks, block_w, block_h, quantizer, raw_quant,
                           dc, cmap_base, ytox_map, ytob_map, group_bx0,
                           group_by0, x_qm_mul, b_qm_mul,
                           biases=DEFAULT_QUANT_BIAS):
    """Vectorized fast path when every block is DCT8X8."""
    n = len(blocks)
    coeffs = np.empty((n, 3, 64), np.int32)
    bxs = np.empty(n, np.int32)
    bys = np.empty(n, np.int32)
    for i, b in enumerate(blocks):
        coeffs[i] = b.coeffs
        bxs[i] = b.bx
        bys[i] = b.by
    table = quantizer.dequant.table(acs.DCT8X8).reshape(3, 64)
    rq = raw_quant[bys, bxs].astype(np.float32)
    scale = (quantizer.inv_global_scale / rq).astype(np.float32)
    tx = (group_bx0 + bxs) // 8
    ty = (group_by0 + bys) // 8
    fx = (cmap_base.base_correlation_x
          + ytox_map[ty, tx] * cmap_base.color_scale).astype(np.float32)
    fb = (cmap_base.base_correlation_b
          + ytob_map[ty, tx] * cmap_base.color_scale).astype(np.float32)
    dq = _native_dequant(coeffs, table.astype(np.float32), scale, fx,
                         fb, x_qm_mul, b_qm_mul, biases)
    if dq is None:
        qmul = np.array([x_qm_mul, 1.0, b_qm_mul], np.float32)
        # adjust_quant_bias vectorized over (n,3,64)
        x = coeffs.astype(np.float32)
        bias_c = np.asarray(biases[:3], np.float32).reshape(1, 3, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            general = x - np.float32(biases[3]) / np.where(x == 0, 1, x)
        biased = np.where(x == 0, 0.0,
                          np.where(x == 1, bias_c,
                                   np.where(x == -1, -bias_c, general)))
        dq = biased * table[None].astype(np.float32) \
            * scale[:, None, None] * qmul[None, :, None]
        dq[:, 0] += fx[:, None] * dq[:, 1]
        dq[:, 2] += fb[:, None] * dq[:, 1]
    dq[:, :, 0] = dc[:, bys, bxs].T  # (n,3)
    i8 = idct_matrix(8).astype(np.float32)
    # Stored layout is transposed (hfreq, vfreq) per the square-DCT rule.
    blocks8 = dq.reshape(n, 3, 8, 8)
    pix = np.einsum("yu,ncvu,wv->ncyw", i8, blocks8, i8, optimize=True)
    out = np.zeros((3, block_h * 8, block_w * 8), np.float32)
    # scatter: all blocks are 8x8 at (by*8, bx*8)
    out_blocks = out.reshape(3, block_h, 8, block_w, 8)
    out_blocks[:, bys, :, bxs, :] = pix.transpose(0, 1, 2, 3)
    return out


def reconstruct_group(blocks: list[CoeffBlock], block_w: int, block_h: int,
                      quantizer: Quantizer, raw_quant: np.ndarray,
                      dc: np.ndarray, cmap_base, ytox_map: np.ndarray,
                      ytob_map: np.ndarray, group_bx0: int, group_by0: int,
                      x_qm_mul: float, b_qm_mul: float,
                      biases: np.ndarray = DEFAULT_QUANT_BIAS) -> np.ndarray:
    """Reconstruct one group's pixels (3, block_h*8, block_w*8).

    dc: (3, block_h, block_w) dequantized DC for this group's blocks.
    ytox/ytob_map: per-64px-tile factors (group-relative indices
    computed from absolute block coords)."""
    # Vectorize the (dominant) DCT8X8 subset; plain rectangular DCTs
    # batch per strategy; only the special 8x8-class transforms take
    # the per-block path.
    dct8 = [b for b in blocks if b.strategy == acs.DCT8X8]
    plain: dict = {}
    rest = []
    for b in blocks:
        if b.strategy == acs.DCT8X8:
            continue
        if b.strategy in _PLAIN_DCT_STRATEGIES:
            plain.setdefault(b.strategy, []).append(b)
        else:
            rest.append(b)
    if dct8:
        out = reconstruct_group_dct8(
            dct8, block_w, block_h, quantizer, raw_quant, dc, cmap_base,
            ytox_map, ytob_map, group_bx0, group_by0, x_qm_mul, b_qm_mul,
            biases)
    else:
        out = np.zeros((3, block_h * 8, block_w * 8), np.float32)
    for s, blks in plain.items():
        _reconstruct_blocks_plain(
            out, blks, s, quantizer, raw_quant, dc, cmap_base, ytox_map,
            ytob_map, group_bx0, group_by0, x_qm_mul, b_qm_mul, biases)
    for blk in rest:
        cx, cy = acs.covered_blocks(blk.strategy)
        abx, aby = group_bx0 + blk.bx, group_by0 + blk.by
        tx, ty = abx // 8, aby // 8
        ytox = cmap_base.ytox(int(ytox_map[ty, tx]))
        ytob = cmap_base.ytob(int(ytob_map[ty, tx]))
        dq = dequant_block(blk.coeffs, blk.strategy, quantizer,
                           int(raw_quant[blk.by, blk.bx]), ytox, ytob,
                           x_qm_mul, b_qm_mul, biases)
        ly, lx = acs.coefficient_layout(cy, cx)
        for c in range(3):
            grid = dq[c].reshape(ly * 8, lx * 8)
            dcs = dc[c, blk.by:blk.by + cy, blk.bx:blk.bx + cx]
            if cx * cy > 1:
                # LLF from DC (stored transposed when cy >= cx).
                llf = llf_from_dc(dcs, cy * 8, cx * 8)
                if cy >= cx:
                    llf = llf.T
                grid[:ly, :lx] = llf
            else:
                grid[0, 0] = dcs[0, 0]
            pix = transform_to_pixels(blk.strategy, grid.ravel())
            out[c, blk.by * 8:(blk.by + cy) * 8,
                blk.bx * 8:(blk.bx + cx) * 8] = pix
    return out


# -- AFV transforms (dec_transforms-inl.h:95-454, enc_transforms-inl.h
# AFVTransformFromPixels). The 8x8 block holds one AFV-transformed 4x4
# corner (selected by kind: 0=TL, 1=TR, 2=BL, 3=BR), one DCT4x4 block
# beside it, and a DCT4x8 half; their DCs are butterflied into
# coefficient slots [0,0], [0,1], [1,0].


def _afv_idct4x4(coeffs: np.ndarray) -> np.ndarray:
    from libjxl_tpu.vardct.afv_data import AFV_BASIS
    return (coeffs.ravel() @ AFV_BASIS).reshape(4, 4)


def _afv_dct4x4(pixels: np.ndarray) -> np.ndarray:
    from libjxl_tpu.vardct.afv_data import AFV_BASIS
    return (AFV_BASIS @ pixels.ravel()).reshape(4, 4)


def _afv_to_pixels(grid: np.ndarray, kind: int) -> np.ndarray:
    afv_x, afv_y = kind & 1, kind >> 1
    block00, block01, block10 = grid[0, 0], grid[0, 1], grid[1, 0]
    dc_afv = (block00 + block10 + block01) * 4.0
    dc_44 = block00 + block10 - block01
    dc_48 = block00 - block10
    out = np.zeros((8, 8))

    coeff = np.zeros((4, 4))
    coeff[0, 0] = dc_afv
    for iy in range(4):
        for ix in range(4):
            if iy == 0 and ix == 0:
                continue
            coeff[iy, ix] = grid[iy * 2, ix * 2]
    block = _afv_idct4x4(coeff)
    ys = slice(None, None, -1) if afv_y else slice(None)
    xs = slice(None, None, -1) if afv_x else slice(None)
    out[afv_y * 4:afv_y * 4 + 4, afv_x * 4:afv_x * 4 + 4] = block[ys, xs]

    b44 = np.zeros((4, 4))
    b44[0, 0] = dc_44
    for iy in range(4):
        for ix in range(4):
            if iy == 0 and ix == 0:
                continue
            b44[iy, ix] = grid[iy * 2, ix * 2 + 1]
    x0 = 0 if afv_x == 1 else 4
    # Square 4x4: transposed-coefficient convention (see DCT4X4).
    out[afv_y * 4:afv_y * 4 + 4, x0:x0 + 4] = idct2d(b44.T)

    b48 = np.zeros((4, 8))
    b48[0, 0] = dc_48
    for iy in range(4):
        for ix in range(8):
            if iy == 0 and ix == 0:
                continue
            b48[iy, ix] = grid[1 + iy * 2, ix]
    y0 = 0 if afv_y == 1 else 4
    out[y0:y0 + 4, :] = idct2d(b48)
    return out


def _afv_from_pixels(pixels: np.ndarray, kind: int) -> np.ndarray:
    afv_x, afv_y = kind & 1, kind >> 1
    grid = np.zeros((8, 8))

    block = pixels[afv_y * 4:afv_y * 4 + 4, afv_x * 4:afv_x * 4 + 4]
    ys = slice(None, None, -1) if afv_y else slice(None)
    xs = slice(None, None, -1) if afv_x else slice(None)
    coeff = _afv_dct4x4(block[ys, xs])
    for iy in range(4):
        for ix in range(4):
            grid[iy * 2, ix * 2] = coeff[iy, ix]

    x0 = 0 if afv_x == 1 else 4
    b44 = dct2d(pixels[afv_y * 4:afv_y * 4 + 4, x0:x0 + 4]).T
    for iy in range(4):
        for ix in range(4):
            grid[iy * 2, ix * 2 + 1] = b44[iy, ix]

    y0 = 0 if afv_y == 1 else 4
    b48 = dct2d(pixels[y0:y0 + 4, :])
    for iy in range(4):
        for ix in range(8):
            grid[1 + iy * 2, ix] = b48[iy, ix]

    block00 = grid[0, 0] * 0.25
    block01 = grid[0, 1]
    block10 = grid[1, 0]
    grid[0, 0] = (block00 + block01 + 2 * block10) * 0.25
    grid[0, 1] = (block00 - block01) * 0.5
    grid[1, 0] = (block00 + block01 - 2 * block10) * 0.25
    return grid


_PLAIN_DCT_STRATEGIES = {
    acs.DCT16X16, acs.DCT32X32, acs.DCT16X8, acs.DCT8X16, acs.DCT32X8,
    acs.DCT8X32, acs.DCT32X16, acs.DCT16X32, acs.DCT64X64, acs.DCT64X32,
    acs.DCT32X64, acs.DCT128X128, acs.DCT128X64, acs.DCT64X128,
    acs.DCT256X256, acs.DCT256X128, acs.DCT128X256,
}


def _reconstruct_blocks_plain(out, blks, strategy, quantizer, raw_quant,
                              dc, cmap_base, ytox_map, ytob_map,
                              group_bx0, group_by0, x_qm_mul, b_qm_mul,
                              biases):
    """Batched dequant + LLF + IDCT for one plain-DCT strategy."""
    from libjxl_tpu.vardct.dct import resample_scales

    cx, cy = acs.covered_blocks(strategy)
    ly, lx = acs.coefficient_layout(cy, cx)
    size = cx * cy * 64
    n = len(blks)
    coeffs = np.empty((n, 3, size), np.int32)
    bxs = np.empty(n, np.int32)
    bys = np.empty(n, np.int32)
    dcs = np.empty((n, 3, cy, cx), np.float32)
    for i, b in enumerate(blks):
        coeffs[i] = b.coeffs
        bxs[i] = b.bx
        bys[i] = b.by
        dcs[i] = dc[:, b.by:b.by + cy, b.bx:b.bx + cx]
    table = quantizer.dequant.table(strategy).reshape(3, size) \
        .astype(np.float32)
    rq = raw_quant[bys, bxs].astype(np.float32)
    scale = (quantizer.inv_global_scale / rq).astype(np.float32)
    tx_ = (group_bx0 + bxs) // 8
    ty_ = (group_by0 + bys) // 8
    fx = (cmap_base.base_correlation_x
          + ytox_map[ty_, tx_] * cmap_base.color_scale).astype(np.float32)
    fb = (cmap_base.base_correlation_b
          + ytob_map[ty_, tx_] * cmap_base.color_scale).astype(np.float32)
    dq = _native_dequant(coeffs, table, scale, fx, fb, x_qm_mul,
                         b_qm_mul, biases)
    if dq is None:
        qmul = np.array([x_qm_mul, 1.0, b_qm_mul], np.float32)
        x = coeffs.astype(np.float32)
        bias_c = np.asarray(biases[:3], np.float32).reshape(1, 3, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            general = x - np.float32(biases[3]) / np.where(x == 0, 1, x)
        biased = np.where(x == 0, 0.0,
                          np.where(x == 1, bias_c,
                                   np.where(x == -1, -bias_c, general)))
        dq = biased * table[None] * scale[:, None, None] \
            * qmul[None, :, None]
        dq[:, 0] += fx[:, None] * dq[:, 1]
        dq[:, 2] += fb[:, None] * dq[:, 1]

    # LLF from DC, batched: dct2d(dcs) * resample scales. The LLF einsum
    # is tiny (cy*cx per block) and stays float64; the full-size IDCT
    # runs as float32 BLAS matmuls (f32 rounding is ~1e-5 relative,
    # far inside the 18181-3 conformance tolerances).
    mcy = dct_matrix(cy) if cy > 1 else np.ones((1, 1))
    mcx = dct_matrix(cx) if cx > 1 else np.ones((1, 1))
    coefdc = np.einsum("ui,ncij,vj->ncuv", mcy, dcs.astype(np.float64),
                       mcx, optimize=True)
    sy = resample_scales(cy, cy * 8)
    sx = resample_scales(cx, cx * 8)
    llf = coefdc * sy[None, None, :, None] * sx[None, None, None, :]
    grid = dq.reshape(n, 3, ly * 8, lx * 8).astype(np.float32)
    if cy >= cx:
        llf = llf.transpose(0, 1, 3, 2)
    grid[:, :, :ly, :lx] = llf.astype(np.float32)
    if cy >= cx:
        grid = np.ascontiguousarray(grid.transpose(0, 1, 3, 2))
    ih = idct_matrix(cy * 8).astype(np.float32)
    iw = idct_matrix(cx * 8).astype(np.float32)
    # pix = ih @ grid @ iw.T via two batched sgemms.
    pix = np.matmul(np.matmul(ih, grid), iw.T)
    # Vectorized scatter: linear pixel indices of every covered sample.
    W = out.shape[2]
    lin = ((bys.astype(np.int64) * 8)[:, None, None]
           + np.arange(cy * 8)[None, :, None]) * W \
        + (bxs.astype(np.int64) * 8)[:, None, None] \
        + np.arange(cx * 8)[None, None, :]
    out.reshape(3, -1)[:, lin.reshape(-1)] = \
        pix.transpose(1, 0, 2, 3).reshape(3, -1)


# -- native full-frame reconstruction ---------------------------------------


import functools


@functools.lru_cache(maxsize=64)
def _rec_frame_plan(used: tuple):
    """Stream-independent packed matrices/LUTs for the native frame
    reconstruction, keyed on the frame's used-strategy set: family8
    bank, slot/covered LUTs, IDCT matrix blob (IW pre-transposed for
    the saxpy second matmul) and the float64 LLF factor blob."""
    from libjxl_tpu.tpu.feed import family8_matrices
    from libjxl_tpu.vardct.dct import resample_scales
    from libjxl_tpu.vardct.group_native import family8_slot_lut

    fam8 = np.ascontiguousarray(family8_matrices(), np.float32)
    slut = np.ascontiguousarray(family8_slot_lut(), np.int8)
    slut64 = np.full(64, -1, np.int8)
    slut64[:len(slut)] = slut
    covx = np.zeros(64, np.int32)
    covy = np.zeros(64, np.int32)
    for s in used:
        cx_, cy_ = acs.covered_blocks(s)
        covx[s], covy[s] = cx_, cy_

    i8 = np.ascontiguousarray(idct_matrix(8), np.float32)
    fparts = []
    ih_off, iw_off = np.zeros(64, np.int64), np.zeros(64, np.int64)
    dparts = []
    mcy_off = np.zeros(64, np.int64)
    mcx_off = np.zeros(64, np.int64)
    sy_off = np.zeros(64, np.int64)
    sx_off = np.zeros(64, np.int64)
    fpos = dpos = 0
    for s in used:
        if slut64[s] >= 0:
            continue
        cx_, cy_ = int(covx[s]), int(covy[s])
        ih = np.ascontiguousarray(idct_matrix(cy_ * 8), np.float32)
        # IW is shipped pre-transposed: the native second matmul runs
        # pix = t1 @ IW^T as a saxpy over rows of IW^T.
        iw = np.ascontiguousarray(
            idct_matrix(cx_ * 8).astype(np.float32).T)
        ih_off[s] = fpos
        fparts.append(ih.ravel()); fpos += ih.size
        iw_off[s] = fpos
        fparts.append(iw.ravel()); fpos += iw.size
        mcy = (dct_matrix(cy_) if cy_ > 1 else np.ones((1, 1))).astype(
            np.float64)
        mcx = (dct_matrix(cx_) if cx_ > 1 else np.ones((1, 1))).astype(
            np.float64)
        sy = resample_scales(cy_, cy_ * 8).astype(np.float64)
        sx = resample_scales(cx_, cx_ * 8).astype(np.float64)
        mcy_off[s] = dpos; dparts.append(mcy.ravel()); dpos += mcy.size
        mcx_off[s] = dpos; dparts.append(mcx.ravel()); dpos += mcx.size
        sy_off[s] = dpos; dparts.append(sy.ravel()); dpos += sy.size
        sx_off[s] = dpos; dparts.append(sx.ravel()); dpos += sx.size
    fblob = np.concatenate(fparts) if fparts else np.zeros(1, np.float32)
    dblob = np.concatenate(dparts) if dparts else np.zeros(1, np.float64)
    fblob = np.ascontiguousarray(fblob, np.float32)
    dblob = np.ascontiguousarray(dblob, np.float64)
    return (fam8, slut64, covx, covy, i8, fblob, ih_off, iw_off, dblob,
            mcy_off, mcx_off, sy_off, sx_off)


def native_reconstruct_frame(coeff_frame, strategies, raw_quant, dc_full,
                             quantizer, cmap, ytox_map, ytob_map,
                             x_qm_mul, b_qm_mul, out,
                             biases=DEFAULT_QUANT_BIAS) -> bool:
    """Whole-frame fused dequant + CfL + LLF + IDCT + scatter in one
    native call (jxl_native.cpp reconstruct_frame), consuming the dense
    stored-layout coefficient frame written by vardct_decode_ac_frame.
    Writes pixels into out[:, :BH*8, :BW*8]; returns False when the
    native module is unavailable (caller falls back to numpy)."""
    import ctypes as C
    try:
        from libjxl_tpu.native.bindings import get_lib
        lib = get_lib()
    except Exception:
        return False
    if lib is None:
        return False
    if not hasattr(lib, "_rec_frame_bound"):
        F = C.POINTER(C.c_float)
        I64 = C.POINTER(C.c_int64)
        lib.reconstruct_frame.restype = None
        lib.reconstruct_frame.argtypes = [
            C.POINTER(C.c_int16), C.POINTER(C.c_int32),
            C.c_int64, C.c_int64,
            C.POINTER(C.c_int32), C.POINTER(C.c_int32), F,
            F, F, C.c_int64,
            C.c_float, C.c_float, C.c_float, C.POINTER(C.c_double),
            F, I64, F, C.POINTER(C.c_int8),
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            F, F, I64, I64,
            C.POINTER(C.c_double), I64, I64, I64, I64,
            F, C.c_int64, C.c_int64]
        lib._rec_frame_bound = True

    from libjxl_tpu.tpu.feed import family8_matrices
    from libjxl_tpu.vardct.dct import resample_scales
    from libjxl_tpu.vardct.group_native import family8_slot_lut

    BH, BW = strategies.shape
    assert coeff_frame.shape == (3, BH * 8, BW * 8)
    if coeff_frame.dtype == np.int16:
        c16 = coeff_frame.ctypes.data_as(C.POINTER(C.c_int16))
        c32 = C.POINTER(C.c_int32)()
    else:
        cf32 = np.ascontiguousarray(coeff_frame, np.int32)
        c16 = C.POINTER(C.c_int16)()
        c32 = cf32.ctypes.data_as(C.POINTER(C.c_int32))

    strat = np.ascontiguousarray(strategies, np.int32)
    rq = np.ascontiguousarray(raw_quant, np.int32)
    dcf = np.ascontiguousarray(dc_full, np.float32)
    fx_map = (cmap.base_correlation_x
              + ytox_map * cmap.color_scale).astype(np.float32)
    fb_map = (cmap.base_correlation_b
              + ytob_map * cmap.color_scale).astype(np.float32)
    fx_map = np.ascontiguousarray(fx_map)
    fb_map = np.ascontiguousarray(fb_map)
    TW = fx_map.shape[1]

    used = [int(s) for s in np.unique(strat[strat >= 0])]
    table_off = np.full(64, -1, np.int64)
    tparts = []
    tpos = 0
    for s in used:
        t = np.ascontiguousarray(
            quantizer.dequant.table(s).reshape(3, -1), np.float32)
        table_off[s] = tpos
        tparts.append(t.ravel())
        tpos += t.size
    tables = np.concatenate(tparts) if tparts else np.zeros(1, np.float32)

    (fam8, slut64, covx, covy, i8, fblob, ih_off, iw_off, dblob,
     mcy_off, mcx_off, sy_off, sx_off) = _rec_frame_plan(tuple(used))
    bs = np.ascontiguousarray(biases, np.float64)
    assert out.dtype == np.float32 and out.flags.c_contiguous
    _, out_h, out_w = out.shape

    def fp(a):
        return a.ctypes.data_as(C.POINTER(C.c_float))

    def ip(a):
        return a.ctypes.data_as(C.POINTER(C.c_int64))

    lib.reconstruct_frame(
        c16, c32, BH, BW,
        strat.ctypes.data_as(C.POINTER(C.c_int32)),
        rq.ctypes.data_as(C.POINTER(C.c_int32)), fp(dcf),
        fp(fx_map), fp(fb_map), TW,
        float(quantizer.inv_global_scale), float(x_qm_mul),
        float(b_qm_mul), bs.ctypes.data_as(C.POINTER(C.c_double)),
        fp(tables), ip(table_off), fp(fam8),
        slut64.ctypes.data_as(C.POINTER(C.c_int8)),
        covx.ctypes.data_as(C.POINTER(C.c_int32)),
        covy.ctypes.data_as(C.POINTER(C.c_int32)),
        fp(i8), fp(fblob), ip(ih_off), ip(iw_off),
        dblob.ctypes.data_as(C.POINTER(C.c_double)),
        ip(mcy_off), ip(mcx_off), ip(sy_off), ip(sx_off),
        fp(out), out_h, out_w)
    return True


def native_reconstruct_group(blocks, brect, quantizer, raw_quant_sl,
                             dc_sl, cmap, ytox_map, ytob_map,
                             x_qm_mul, b_qm_mul,
                             biases=DEFAULT_QUANT_BIAS):
    """Group/band-local native reconstruction: scatter the per-block
    coefficients into a rect-local dense frame and run the SAME fused
    kernel as the whole-frame path (reconstruction is block-local, so
    the output is bit-identical to native_reconstruct_frame on the full
    frame). brect is the block-unit rect (x0/y0 multiples of 8 blocks so
    tile maps slice cleanly). Returns (3, ysize*8, xsize*8) or None."""
    from libjxl_tpu.vardct.group_native import scatter_blocks_to_frame
    BH, BW = brect.ysize, brect.xsize
    strat = np.full((BH, BW), -1, np.int32)
    for b in blocks:
        strat[b.by, b.bx] = b.strategy
    coeff = np.zeros((3, BH * 8, BW * 8), np.int32)
    mat_ids = np.zeros((BH, BW), np.int8)
    scatter_blocks_to_frame(blocks, coeff, mat_ids, 0, 0, 0)
    ty0, tx0 = brect.y0 // 8, brect.x0 // 8
    ty1 = (brect.y0 + BH + 7) // 8
    tx1 = (brect.x0 + BW + 7) // 8
    out = np.zeros((3, BH * 8, BW * 8), np.float32)
    ok = native_reconstruct_frame(
        coeff, strat, raw_quant_sl, dc_sl, quantizer, cmap,
        ytox_map[ty0:ty1, tx0:tx1], ytob_map[ty0:ty1, tx0:tx1],
        x_qm_mul, b_qm_mul, out, biases)
    return out if ok else None
