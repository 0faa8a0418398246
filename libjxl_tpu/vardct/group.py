"""Per-group AC coefficient (de)tokenization.

Reference: lib/jxl/dec_group.cc (DecodeACVarBlock, group decode loop),
enc_entropy_coder.cc (TokenizeCoefficients). Works on quantized
coefficient blocks; dequant + IDCT happen in the batched device path
(ops/) or the numpy reference (reconstruct.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.base.rect import Rect
from libjxl_tpu.base.signed import pack_signed, unpack_signed
from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct.ac_context import BlockCtxMap, zero_density_context


def predict_from_top_and_left(row_top, row, x: int, default: int) -> int:
    """entropy_coder.h:25-35."""
    if x == 0:
        return default if row_top is None else int(row_top[x])
    if row_top is None:
        return int(row[x - 1])
    return (int(row_top[x]) + int(row[x - 1]) + 1) // 2


@dataclasses.dataclass
class CoeffBlock:
    bx: int            # in 8x8 blocks, group-relative
    by: int
    strategy: int
    coeffs: np.ndarray  # (3, size) int32, natural coefficient-layout linear


def decode_group_coeffs(reader, block_rect_w: int, block_rect_h: int,
                        strategies: np.ndarray, raw_quant: np.ndarray,
                        orders: dict, ctx_map: BlockCtxMap,
                        ctx_offset: int = 0,
                        qdc: np.ndarray | None = None) -> list[CoeffBlock]:
    """Decode one group's AC tokens (444 only for now).

    strategies: (h, w) int arrays of per-8x8-block raw strategy, with -1
    marking non-first blocks of a multi-block strategy.
    raw_quant: (h, w) int quant field. Returns list of CoeffBlock.
    """
    nzeros_rows = [np.zeros((block_rect_h, block_rect_w), np.int32)
                   for _ in range(3)]
    out = []
    for by in range(block_rect_h):
        for bx in range(block_rect_w):
            strategy = int(strategies[by, bx])
            if strategy < 0:
                continue
            cx, cy = acs.covered_blocks(strategy)
            covered = cx * cy
            log2_covered = covered.bit_length() - 1
            size = covered * 64
            ord_b = acs.STRATEGY_ORDER[strategy]
            block = np.zeros((3, size), np.int32)
            dc_idx = ctx_map.dc_context(qdc[:, by, bx]) if qdc is not None \
                else 0
            for c in (1, 0, 2):
                order = orders[(ord_b, c)]
                nz_row = nzeros_rows[c]
                row_top = nz_row[by - 1] if by > 0 else None
                predicted = predict_from_top_and_left(row_top, nz_row[by],
                                                      bx, 32)
                block_ctx = ctx_map.context(dc_idx, int(raw_quant[by, bx]),
                                            ord_b, c)
                nzero_ctx = ctx_map.nonzero_context(predicted, block_ctx) \
                    + ctx_offset
                nzeros = reader.read(nzero_ctx)
                if nzeros > size - covered:
                    raise BitstreamError("too many nonzeros")
                nz_row[by:by + cy, bx:bx + cx] = \
                    (nzeros + covered - 1) >> log2_covered
                histo_offset = ctx_offset + \
                    ctx_map.zero_density_offset(block_ctx)
                prev = 0 if nzeros > size // 16 else 1
                k = covered
                while k < size and nzeros != 0:
                    ctx = histo_offset + zero_density_context(
                        nzeros, k, covered, log2_covered, prev)
                    u = reader.read(ctx)
                    coeff = unpack_signed(u)
                    block[c, order[k]] += coeff
                    prev = 1 if u != 0 else 0
                    nzeros -= prev
                    k += 1
                if nzeros != 0:
                    raise BitstreamError("nzeros mismatch at end of block")
            out.append(CoeffBlock(bx, by, strategy, block))
    return out


def tokenize_group_coeffs(blocks: list[CoeffBlock], block_rect_w: int,
                          block_rect_h: int, raw_quant: np.ndarray,
                          orders: dict, ctx_map: BlockCtxMap,
                          tokens: list, qdc: np.ndarray | None = None) -> None:
    """TokenizeCoefficients mirror; appends Tokens."""
    from libjxl_tpu.entropy.codes import Token

    nzeros_rows = [np.zeros((block_rect_h, block_rect_w), np.int32)
                   for _ in range(3)]
    for blk in sorted(blocks, key=lambda b: (b.by, b.bx)):
        strategy = blk.strategy
        cx, cy = acs.covered_blocks(strategy)
        covered = cx * cy
        log2_covered = covered.bit_length() - 1
        size = covered * 64
        ord_b = acs.STRATEGY_ORDER[strategy]
        bx, by = blk.bx, blk.by
        dc_idx = ctx_map.dc_context(qdc[:, by, bx]) if qdc is not None else 0
        for c in (1, 0, 2):
            order = orders[(ord_b, c)]
            vals = blk.coeffs[c]
            nzeros = int(np.count_nonzero(vals)) \
                - int(np.count_nonzero(vals[order[:covered]]))
            nz_row = nzeros_rows[c]
            row_top = nz_row[by - 1] if by > 0 else None
            predicted = predict_from_top_and_left(row_top, nz_row[by], bx, 32)
            block_ctx = ctx_map.context(dc_idx, int(raw_quant[by, bx]),
                                        ord_b, c)
            nzero_ctx = ctx_map.nonzero_context(predicted, block_ctx)
            tokens.append(Token(nzero_ctx, nzeros))
            nz_row[by:by + cy, bx:bx + cx] = \
                (nzeros + covered - 1) >> log2_covered
            histo_offset = ctx_map.zero_density_offset(block_ctx)
            prev = 0 if nzeros > size // 16 else 1
            k = covered
            while k < size and nzeros != 0:
                coeff = int(vals[order[k]])
                u = pack_signed(coeff)
                ctx = histo_offset + zero_density_context(
                    nzeros, k, covered, log2_covered, prev)
                tokens.append(Token(ctx, u))
                prev = 1 if u != 0 else 0
                nzeros -= prev
                k += 1


def _sub_dims(bw: int, bh: int, h: int, v: int) -> tuple[int, int]:
    return (bw + (1 << h) - 1) >> h, (bh + (1 << v) - 1) >> v


def decode_group_coeffs_subsampled(reader, block_rect_w: int,
                                   block_rect_h: int,
                                   raw_quant: np.ndarray, orders: dict,
                                   ctx_map: BlockCtxMap, ctx_offset: int,
                                   shifts: list) -> list:
    """Chroma-subsampled group AC decode (dec_group.cc LoadBlock with
    per-channel hshift/vshift; all blocks DCT8X8, as produced by JPEG
    transcoding). shifts: [(h, v)] per channel (X, Y, B order).
    Returns per-channel (sbh, sbw, 64) int32 coefficient arrays."""
    coeffs = []
    nzeros_rows = []
    for c in range(3):
        h, v = shifts[c]
        sbw, sbh = _sub_dims(block_rect_w, block_rect_h, h, v)
        coeffs.append(np.zeros((sbh, sbw, 64), np.int32))
        nzeros_rows.append(np.zeros((sbh, sbw), np.int32))
    ord_b = acs.STRATEGY_ORDER[acs.DCT8X8]
    for by in range(block_rect_h):
        for bx in range(block_rect_w):
            for c in (1, 0, 2):
                h, v = shifts[c]
                sbx, sby = bx >> h, by >> v
                if (sbx << h) != bx or (sby << v) != by:
                    continue
                order = orders[(ord_b, c)]
                nz_row = nzeros_rows[c]
                row_top = nz_row[sby - 1] if sby > 0 else None
                predicted = predict_from_top_and_left(
                    row_top, nz_row[sby], sbx, 32)
                block_ctx = ctx_map.context(0, int(raw_quant[by, bx]),
                                            ord_b, c)
                nzero_ctx = ctx_map.nonzero_context(predicted, block_ctx) \
                    + ctx_offset
                nzeros = reader.read(nzero_ctx)
                if nzeros > 63:
                    raise BitstreamError("too many nonzeros")
                nz_row[sby, sbx] = nzeros
                histo_offset = ctx_offset + \
                    ctx_map.zero_density_offset(block_ctx)
                prev = 0 if nzeros > 4 else 1
                k = 1
                block = coeffs[c][sby, sbx]
                while k < 64 and nzeros != 0:
                    ctx = histo_offset + zero_density_context(
                        nzeros, k, 1, 0, prev)
                    u = reader.read(ctx)
                    coeff = unpack_signed(u)
                    block[order[k]] += coeff
                    prev = 1 if u != 0 else 0
                    nzeros -= prev
                    k += 1
                if nzeros != 0:
                    raise BitstreamError("nzeros mismatch (subsampled)")
    return coeffs


def tokenize_group_coeffs_subsampled(coeffs: list, block_rect_w: int,
                                     block_rect_h: int,
                                     raw_quant: np.ndarray, orders: dict,
                                     ctx_map: BlockCtxMap, tokens: list,
                                     shifts: list) -> None:
    """Encoder mirror of decode_group_coeffs_subsampled."""
    from libjxl_tpu.entropy.codes import Token

    nzeros_rows = []
    for c in range(3):
        h, v = shifts[c]
        sbw, sbh = _sub_dims(block_rect_w, block_rect_h, h, v)
        nzeros_rows.append(np.zeros((sbh, sbw), np.int32))
    ord_b = acs.STRATEGY_ORDER[acs.DCT8X8]
    for by in range(block_rect_h):
        for bx in range(block_rect_w):
            for c in (1, 0, 2):
                h, v = shifts[c]
                sbx, sby = bx >> h, by >> v
                if (sbx << h) != bx or (sby << v) != by:
                    continue
                order = orders[(ord_b, c)]
                block = coeffs[c][sby, sbx]
                vals = block[order[1:]]
                nzeros = int(np.count_nonzero(vals))
                nz_row = nzeros_rows[c]
                row_top = nz_row[sby - 1] if sby > 0 else None
                predicted = predict_from_top_and_left(
                    row_top, nz_row[sby], sbx, 32)
                block_ctx = ctx_map.context(0, int(raw_quant[by, bx]),
                                            ord_b, c)
                nzero_ctx = ctx_map.nonzero_context(predicted, block_ctx)
                tokens.append(Token(nzero_ctx, nzeros))
                nz_row[sby, sbx] = nzeros
                histo_offset = ctx_map.zero_density_offset(block_ctx)
                prev = 0 if nzeros > 4 else 1
                k = 1
                left = nzeros
                while k < 64 and left != 0:
                    ctx = histo_offset + zero_density_context(
                        left, k, 1, 0, prev)
                    v_ = int(block[order[k]])
                    tokens.append(Token(ctx, pack_signed(v_)))
                    prev = 1 if v_ != 0 else 0
                    left -= prev
                    k += 1
