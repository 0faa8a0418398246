"""Native-accelerated VarDCT AC group (de)tokenization.

Wraps jxl_native vardct_decode_ac / vardct_tokenize_ac; falls back to
the Python reference in vardct/group.py when unavailable.
"""

from __future__ import annotations

import ctypes as C

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct.ac_context import BlockCtxMap
from libjxl_tpu.vardct.group import CoeffBlock


def prepare_frame(strategies: np.ndarray, raw_quant: np.ndarray,
                  ctx_map: BlockCtxMap, fd, qdc: np.ndarray | None = None):
    """Pass-independent per-block arrays for ALL AC groups of a frame,
    concatenated in group order (one allocation pass, shared across
    progressive passes — only the coefficient-order offsets differ per
    pass; see pass_order_offsets)."""
    from libjxl_tpu.vardct.ac_strategy import NUM_ORDERS
    bys_l, bxs_l, rects = [], [], []
    g_nb = np.zeros(fd.num_groups, np.int32)
    for g in range(fd.num_groups):
        brect = fd.block_group_rect(g)
        rects.append(brect)
        ys, xs = np.nonzero(strategies[brect.slices()] >= 0)
        g_nb[g] = len(ys)
        bys_l.append(ys)
        bxs_l.append(xs)
    blk_by = np.concatenate(bys_l).astype(np.int32)
    blk_bx = np.concatenate(bxs_l).astype(np.int32)
    g_blk_off = np.zeros(fd.num_groups, np.int64)
    np.cumsum(g_nb[:-1], out=g_blk_off[1:])
    # Absolute block coords for strategy/qf lookups.
    ys_abs = blk_by.astype(np.int64).copy()
    xs_abs = blk_bx.astype(np.int64).copy()
    for g, brect in enumerate(rects):
        sl = slice(int(g_blk_off[g]), int(g_blk_off[g]) + int(g_nb[g]))
        ys_abs[sl] += brect.y0
        xs_abs[sl] += brect.x0
    strat = strategies[ys_abs, xs_abs].astype(np.int32)
    blk_cx = _COVERED_X[strat]
    blk_cy = _COVERED_Y[strat]
    n = len(strat)
    ord_b = np.asarray(acs.STRATEGY_ORDER, np.int64)[strat]
    qf = np.asarray(raw_quant)[ys_abs, xs_abs].astype(np.int64)
    qf_ths = np.asarray(sorted(ctx_map.qf_thresholds), np.int64)
    qf_idx = np.searchsorted(qf_ths, qf, side="left") \
        if len(qf_ths) else np.zeros(n, np.int64)
    if qdc is not None and ctx_map.num_dc_ctxs > 1:
        dc_idx = np.zeros(n, np.int64)
        for c in (0, 1, 2):
            ths = np.asarray(sorted(ctx_map.dc_thresholds[c]), np.int64)
            bucket = np.searchsorted(ths, qdc[c, ys_abs, xs_abs],
                                     side="left") \
                if len(ths) else np.zeros(n, np.int64)
            dc_idx = dc_idx * (len(ths) + 1) + bucket
    else:
        dc_idx = np.zeros(n, np.int64)
    nqf = len(ctx_map.qf_thresholds) + 1
    cmap_arr = np.asarray(ctx_map.ctx_map, np.int32)
    blk_ctx = np.zeros((n, 3), np.int32)
    for c in range(3):
        cidx = (c ^ 1) if c < 2 else 2
        idx = ((cidx * NUM_ORDERS + ord_b) * nqf + qf_idx) \
            * ctx_map.num_dc_ctxs + dc_idx
        blk_ctx[:, c] = cmap_arr[idx]
    return {
        "n": n, "g_nb": g_nb, "g_blk_off": g_blk_off, "rects": rects,
        "blk_bx": blk_bx, "blk_by": blk_by, "blk_cx": blk_cx,
        "blk_cy": blk_cy, "strat": strat, "blk_ctx": blk_ctx,
        "ord_b": ord_b,
    }


def pass_order_offsets(fprep: dict, orders: dict, row_stride: int):
    """Per-pass (flat pixel-offset orders, (n, 3) order offsets) for a
    frame prep. Coefficient positions are pre-baked into PIXEL offsets
    within a block's top-left (`(p >> wlog) * row_stride + (p & wmask)`)
    so the native token loop does one add per coefficient instead of
    shift/mask/multiply address math — row_stride is frame-constant.

    An order bucket serves BOTH orientations of a rectangular block
    (coeff_order.h kStrategyOrder maps e.g. DCT16X8 and DCT8X16 to one
    bucket) while the stored->pixel baking depends on the block's OWN
    covered_x, so one segment is baked per (bucket, channel, log2cx)
    orientation that actually appears in the frame."""
    flat_orders, order_index = flatten_orders(orders)
    # log2(covered_x) per block (covered_x is a power of two).
    blk_l2cx = _LOG2_LUT[np.asarray(fprep["blk_cx"], np.int64)]
    ord_b = np.asarray(fprep["ord_b"], np.int64)
    # Needed (bucket, log2cx) orientations, vectorized over the frame.
    need = {}
    for pv in np.unique(ord_b * 8 + blk_l2cx).tolist():
        need.setdefault(pv >> 3, set()).add(pv & 7)
    parts = []
    lut = {}
    pos = 0
    p_all = flat_orders.astype(np.int64)
    for (ob, c), off_v in order_index.items():
        ln = _bucket_order_len(orders, (ob, c))
        seg = p_all[off_v:off_v + ln]
        for l2 in sorted(need.get(ob, {int(_BUCKET_LOG2_CX[ob])})):
            wlog = 3 + l2
            poff = (seg >> wlog) * row_stride + (seg & ((1 << wlog) - 1))
            lut[(ob, c, l2)] = pos
            parts.append(poff)
            pos += ln
    flat = (np.concatenate(parts) if parts
            else np.zeros(1, np.int64)).astype(np.int32)
    from libjxl_tpu.vardct.ac_strategy import NUM_ORDERS
    lut_arr = np.zeros((NUM_ORDERS, 3, 8), np.int32)
    for (ob, c, l2), off in lut.items():
        lut_arr[ob, c, l2] = off
    blk_oo = lut_arr[ord_b, :, blk_l2cx]  # (n, 3) vectorized gather
    return (np.ascontiguousarray(flat),
            np.ascontiguousarray(blk_oo.astype(np.int32)))


# log2 LUT for power-of-two covered_x values (1..32).
_LOG2_LUT = np.zeros(64, np.int64)
for _v in range(1, 64):
    _LOG2_LUT[_v] = _v.bit_length() - 1
del _v


def _bucket_order_len(orders: dict, key) -> int:
    return len(orders[key])


def _bucket_log2_cx() -> np.ndarray:
    """log2(covered_x) per order bucket (coeff_order.h kStrategyOrder:
    every strategy in a bucket shares one block shape)."""
    from libjxl_tpu.vardct.ac_strategy import (COVERED_X, NUM_ORDERS,
                                               STRATEGY_ORDER)
    out = np.zeros(NUM_ORDERS, np.int64)
    for s, ob in enumerate(STRATEGY_ORDER):
        out[ob] = int(COVERED_X[s]).bit_length() - 1
    return out


_BUCKET_LOG2_CX = _bucket_log2_cx()


def native_decode_ac_multi(sections, codes, fprep, flat_orders, blk_oo,
                           ctx_offsets, shift, num_ctxs, frame, mat_ids,
                           set_mat_ids: bool = True, nz_sink=None,
                           sink_only: bool = False):
    """Interleaved native decode of all AC group sections of one pass
    (jxl_native.cpp vardct_decode_ac_multi). Coefficients accumulate
    into the int16 `frame` as value << shift.

    sections: list of (bytes, bit_pos) per group, positioned after the
    histogram-selector bits. fprep: prepare_frame() result;
    (flat_orders, blk_oo): pass_order_offsets() result for this pass.
    Returns a list of per-group end bit positions on success, the
    string "overflow" with the list of failed group indices as a tuple
    when any group hit int16 overflow, or None when the native path is
    unavailable.

    nz_sink: optional (idx int32[cap], val int16[cap], cursor int64[1])
    the decoder appends each nonzero contribution to (sparse device
    transfer); cursor[0] == -1 signals capacity overflow.
    """
    lib = _lib()
    if lib is None or codes.use_prefix_code or codes.lz77.enabled:
        return None
    n = len(sections)
    if n == 0:
        return []
    from libjxl_tpu.native.bindings import codes_tables
    packed, cmap_arr, cfgs = codes_tables(codes)
    _, H, W = frame.shape
    BH, BW = mat_ids.shape
    rects = fprep["rects"]
    slot_lut = family8_slot_lut()
    g_data = (C.c_char_p * n)(*[s[0] for s in sections])
    g_size = np.array([len(s[0]) for s in sections], np.uint64)
    g_bitpos = np.array([s[1] for s in sections], np.uint64)
    g_bw = np.array([r.xsize for r in rects], np.int32)
    g_bh = np.array([r.ysize for r in rects], np.int32)
    g_origin = np.array([r.y0 * 8 * W + r.x0 * 8 for r in rects], np.int64)
    g_morigin = np.array([r.y0 * BW + r.x0 for r in rects], np.int64)
    ctx_off = np.asarray(ctx_offsets, np.int32)
    out_rc = np.zeros(n, np.int32)
    out_bitpos = np.zeros(n, np.uint64)
    out_final = np.zeros(n, np.int32)
    rc = lib.vardct_decode_ac_multi(
        n, g_data, _p(g_size, C.c_uint64), _p(g_bitpos, C.c_uint64),
        _p(packed, C.c_uint32), _p(cmap_arr, C.c_uint8),
        _p(cfgs, C.c_int32), codes.num_histograms, num_ctxs,
        _p(ctx_off, C.c_int32), shift,
        _p(fprep["g_nb"], C.c_int32), _p(fprep["g_blk_off"], C.c_int64),
        _p(g_bw, C.c_int32), _p(g_bh, C.c_int32),
        _p(g_origin, C.c_int64), _p(g_morigin, C.c_int64),
        _p(fprep["blk_bx"], C.c_int32), _p(fprep["blk_by"], C.c_int32),
        _p(fprep["blk_cx"], C.c_int32), _p(fprep["blk_cy"], C.c_int32),
        _p(fprep["blk_ctx"], C.c_int32), _p(blk_oo, C.c_int32),
        _p(flat_orders, C.c_int32),
        _p(fprep["strat"], C.c_int32) if set_mat_ids else None,
        _p(slot_lut, C.c_int8) if set_mat_ids else None,
        _p(frame, C.c_int16), H * W, W,
        _p(mat_ids, C.c_int8), BW,
        _p(out_rc, C.c_int32), _p(out_bitpos, C.c_uint64),
        _p(out_final, C.c_int32),
        _p(nz_sink[0], C.c_int32) if nz_sink else None,
        _p(nz_sink[1], C.c_int16) if nz_sink else None,
        nz_sink[0].size if nz_sink else 0,
        _p(nz_sink[2], C.c_int64) if nz_sink else None,
        1 if (sink_only and nz_sink) else 0)
    if rc != 0:
        raise BitstreamError(f"native multi AC decode failed ({rc})")
    overflow = [g for g in range(n) if out_rc[g] in (-12, -13)]
    if overflow:
        if nz_sink is not None:
            nz_sink[2][0] = -1  # sink contents incomplete
        return ("overflow", overflow)
    for g in range(n):
        if out_rc[g] != 0:
            raise BitstreamError(
                f"native AC decode failed in group {g} ({out_rc[g]})")
        if not out_final[g]:
            raise BitstreamError(f"bad ANS state in AC group {g}")
    return [int(b) for b in out_bitpos]


def _lib():
    try:
        from libjxl_tpu.native.bindings import get_lib
    except Exception:
        return None
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_vardct_bound"):
        lib.vardct_decode_ac.restype = C.c_int
        lib.vardct_decode_ac.argtypes = [
            C.c_void_p, C.c_int, C.c_int, C.c_int,
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_int64), C.POINTER(C.c_int32),
            C.c_int, C.c_int, C.POINTER(C.c_int32)]
        lib.vardct_tokenize_ac.restype = C.c_int64
        lib.vardct_tokenize_ac.argtypes = [
            C.c_int, C.c_int, C.c_int,
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_int64), C.POINTER(C.c_int32), C.c_int,
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_uint32), C.c_int64]
        lib._vardct_bound = True
    return lib


def _p(arr, t):
    return arr.ctypes.data_as(C.POINTER(t))


_COVERED_X = np.asarray(acs.COVERED_X, np.int32)
_COVERED_Y = np.asarray(acs.COVERED_Y, np.int32)


def flatten_orders(orders: dict) -> tuple[np.ndarray, dict]:
    """Flatten the per-(order-bucket, channel) coefficient orders once
    per frame/pass; prepare_blocks reuses the result across groups."""
    order_parts = []
    order_index = {}
    off = 0
    for key, arr in orders.items():
        order_index[key] = off
        order_parts.append(np.asarray(arr, np.int32))
        off += len(arr)
    flat_orders = np.ascontiguousarray(np.concatenate(order_parts)) \
        if order_parts else np.zeros(1, np.int32)
    return flat_orders, order_index


def prepare_blocks(strategies: np.ndarray, raw_quant: np.ndarray,
                   ctx_map: BlockCtxMap, orders: dict,
                   qdc: np.ndarray | None = None,
                   flat_cache: tuple | None = None):
    """Precompute per-block arrays + flattened orders for the native
    coder. Returns dict or None if unsupported (non-default dc ctx)."""
    ys, xs = np.nonzero(strategies >= 0)
    n = len(ys)
    blk_bx = xs.astype(np.int32)
    blk_by = ys.astype(np.int32)
    strat = strategies[ys, xs].astype(np.int32)
    blk_cx = _COVERED_X[strat]
    blk_cy = _COVERED_Y[strat]
    flat_orders, order_index = flat_cache if flat_cache is not None \
        else flatten_orders(orders)
    # Vectorized per-block context + order-offset computation
    # (ac_context.h BlockCtxMap::Context over all blocks at once).
    ord_b = np.asarray(acs.STRATEGY_ORDER, np.int64)[strat]
    sizes = (np.asarray(acs.COVERED_X, np.int64)[strat]
             * np.asarray(acs.COVERED_Y, np.int64)[strat] * 64)
    qf = np.asarray(raw_quant)[ys, xs].astype(np.int64)
    qf_ths = np.asarray(sorted(ctx_map.qf_thresholds), np.int64)
    qf_idx = np.searchsorted(qf_ths, qf, side="left") \
        if len(qf_ths) else np.zeros(n, np.int64)
    if qdc is not None and ctx_map.num_dc_ctxs > 1:
        dc_idx = np.zeros(n, np.int64)
        for c in (0, 1, 2):
            ths = np.asarray(sorted(ctx_map.dc_thresholds[c]), np.int64)
            bucket = np.searchsorted(ths, qdc[c, ys, xs], side="left") \
                if len(ths) else np.zeros(n, np.int64)
            dc_idx = dc_idx * (len(ths) + 1) + bucket
    else:
        dc_idx = np.zeros(n, np.int64)
    nqf = len(ctx_map.qf_thresholds) + 1
    cmap_arr = np.asarray(ctx_map.ctx_map, np.int32)
    from libjxl_tpu.vardct.ac_strategy import NUM_ORDERS
    blk_ctx = np.zeros((n, 3), np.int32)
    blk_order_off = np.zeros((n, 3), np.int32)
    order_lut = np.zeros((NUM_ORDERS, 3), np.int32)
    for (ob, c), off_v in order_index.items():
        order_lut[ob, c] = off_v
    for c in range(3):
        cidx = (c ^ 1) if c < 2 else 2
        idx = ((cidx * NUM_ORDERS + ord_b) * nqf + qf_idx) \
            * ctx_map.num_dc_ctxs + dc_idx
        blk_ctx[:, c] = cmap_arr[idx]
        blk_order_off[:, c] = order_lut[ord_b, c]
    blk_coeff_off = np.zeros(n, np.int64)
    np.cumsum(3 * sizes[:-1], out=blk_coeff_off[1:])
    total = int(3 * sizes.sum())
    return {
        "n": n, "blk_bx": blk_bx, "blk_by": blk_by, "blk_cx": blk_cx,
        "blk_cy": blk_cy, "strat": strat, "blk_ctx": blk_ctx,
        "blk_order_off": blk_order_off, "blk_coeff_off": blk_coeff_off,
        "orders": flat_orders, "total_coeffs": total,
    }


def native_decode_group(data: bytes, bit_pos: int, codes, bw: int, bh: int,
                        prep: dict, ctx_map: BlockCtxMap,
                        ctx_offset: int,
                        as_blocks: bool = True
                        ) -> tuple[list, int] | None:
    """Returns (blocks, new_bit_pos) or None on fallback. With
    as_blocks=False, returns (flat_coeffs, new_bit_pos) and the caller
    slices per-block data via prep["blk_coeff_off"] — skips the
    per-block materialization on the device-feed hot path."""
    lib = _lib()
    if lib is None or codes.use_prefix_code:
        return None
    from libjxl_tpu.native.bindings import NativeModularDecoder

    dec = NativeModularDecoder(data, bit_pos, codes, 0)
    coeffs = np.zeros(prep["total_coeffs"], np.int32)
    try:
        rc = lib.vardct_decode_ac(
            dec.handle, bw, bh, prep["n"],
            _p(prep["blk_bx"], C.c_int32), _p(prep["blk_by"], C.c_int32),
            _p(prep["blk_cx"], C.c_int32), _p(prep["blk_cy"], C.c_int32),
            _p(prep["blk_ctx"], C.c_int32),
            _p(prep["blk_order_off"], C.c_int32),
            _p(prep["blk_coeff_off"], C.c_int64),
            _p(prep["orders"], C.c_int32), ctx_map.num_ctxs, ctx_offset,
            _p(coeffs, C.c_int32))
        if rc != 0:
            raise BitstreamError(f"native AC decode failed ({rc})")
        if not dec.check_final():
            raise BitstreamError("bad ANS state in AC group")
        pos = dec.bit_pos()
    finally:
        dec.close()
    if not as_blocks:
        return coeffs, pos
    blocks = []
    for i in range(prep["n"]):
        s = int(prep["strat"][i])
        size = acs.COVERED_X[s] * acs.COVERED_Y[s] * 64
        off = prep["blk_coeff_off"][i]
        blocks.append(CoeffBlock(
            int(prep["blk_bx"][i]), int(prep["blk_by"][i]), s,
            coeffs[off:off + 3 * size].reshape(3, size)))
    return blocks, pos


_SLOT_LUT = None


def family8_slot_lut() -> np.ndarray:
    """int8[64]: strategy id -> 8x8-family matrix-bank slot, or -1."""
    global _SLOT_LUT
    if _SLOT_LUT is None:
        from libjxl_tpu.tpu.feed import FAMILY8
        lut = np.full(64, -1, np.int8)
        for slot, s in enumerate(FAMILY8):
            lut[s] = slot
        _SLOT_LUT = lut
    return _SLOT_LUT


def native_decode_group_frame(data: bytes, bit_pos: int, codes,
                              bw: int, bh: int, prep: dict,
                              ctx_map: BlockCtxMap, ctx_offset: int,
                              frame: np.ndarray, mat_ids: np.ndarray,
                              gy0: int, gx0: int):
    """Decode one AC group's coefficients STRAIGHT into the frame-level
    int16 coefficient image (the device feed) and fill the transform
    slot map — no per-block/flat intermediate (jxl_native.cpp
    vardct_decode_ac_frame). Returns the new bit position, "overflow"
    when a coefficient exceeds int16 (caller promotes to int32), or
    None when the native path is unavailable."""
    lib = _lib()
    if lib is None or codes.use_prefix_code:
        return None
    from libjxl_tpu.native.bindings import NativeModularDecoder

    _, H, W = frame.shape
    BH, BW = mat_ids.shape
    slot_lut = family8_slot_lut()
    dec = NativeModularDecoder(data, bit_pos, codes, 0)
    try:
        rc = lib.vardct_decode_ac_frame(
            dec.handle, bw, bh, prep["n"],
            _p(prep["blk_bx"], C.c_int32), _p(prep["blk_by"], C.c_int32),
            _p(prep["blk_cx"], C.c_int32), _p(prep["blk_cy"], C.c_int32),
            _p(prep["blk_ctx"], C.c_int32),
            _p(prep["blk_order_off"], C.c_int32),
            _p(prep["orders"], C.c_int32), ctx_map.num_ctxs, ctx_offset,
            _p(prep["strat"], C.c_int32), _p(slot_lut, C.c_int8),
            _p(frame, C.c_int16), H * W, W,
            gy0 * 8 * W + gx0 * 8,
            _p(mat_ids, C.c_int8), BW, gy0 * BW + gx0)
        if rc == -12:
            return "overflow"
        if rc != 0:
            raise BitstreamError(f"native AC decode failed ({rc})")
        if not dec.check_final():
            raise BitstreamError("bad ANS state in AC group")
        return dec.bit_pos()
    finally:
        dec.close()


def scatter_flat_to_frame(flat: np.ndarray, prep: dict, frame: np.ndarray,
                          mat_ids: np.ndarray, gy0: int, gx0: int,
                          shift: int = 0, accumulate: bool = False) -> None:
    """Scatter a flat (int32) group coefficient buffer into the
    frame-level coefficient image (fallback for int16 overflow /
    prefix-coded groups). With accumulate=True, adds flat << shift
    (progressive passes). Mirrors tpu/feed.py build_feed2's flat branch."""
    _, H, W = frame.shape
    slot_lut = family8_slot_lut().astype(np.int64)
    strat = prep["strat"]
    offs = prep["blk_coeff_off"]
    slots = slot_lut[strat]
    fam = slots >= 0
    cv = frame.reshape(3, H // 8, 8, W // 8, 8)
    if fam.any():
        bys = prep["blk_by"][fam].astype(np.int64) + gy0
        bxs = prep["blk_bx"][fam].astype(np.int64) + gx0
        gather = offs[fam][:, None] + np.arange(192)
        cf = flat[gather].reshape(-1, 3, 8, 8) << shift
        if accumulate:
            cv[:, bys, :, bxs, :] += cf.astype(frame.dtype)
        else:
            cv[:, bys, :, bxs, :] = cf
        mat_ids[bys, bxs] = slots[fam]
    for i in np.nonzero(~fam)[0]:
        s = int(strat[i])
        cx, cy = acs.covered_blocks(s)
        size = 3 * cx * cy * 64
        off = int(offs[i])
        by = gy0 + int(prep["blk_by"][i])
        bx = gx0 + int(prep["blk_bx"][i])
        cf = flat[off:off + size].reshape(3, cy * 8, cx * 8) << shift
        dst = frame[:, by * 8:(by + cy) * 8, bx * 8:(bx + cx) * 8]
        if accumulate:
            dst += cf.astype(frame.dtype)
        else:
            dst[...] = cf


def scatter_blocks_to_frame(blocks: list, frame: np.ndarray,
                            mat_ids: np.ndarray, gy0: int, gx0: int,
                            shift: int = 0,
                            accumulate: bool = False) -> None:
    """Scatter Python CoeffBlocks into the frame coefficient image
    (pure-Python fallback of the native frame decode)."""
    slot_lut = family8_slot_lut()
    for blk in blocks:
        s = int(blk.strategy)
        cx, cy = acs.covered_blocks(s)
        by, bx = gy0 + blk.by, gx0 + blk.bx
        cf = blk.coeffs.reshape(3, cy * 8, cx * 8) << shift
        dst = frame[:, by * 8:(by + cy) * 8, bx * 8:(bx + cx) * 8]
        if accumulate:
            dst += cf.astype(frame.dtype)
        else:
            dst[...] = cf
        if slot_lut[s] >= 0:
            mat_ids[by, bx] = slot_lut[s]


def native_tokenize_group(blocks: list, bw: int, bh: int, prep: dict,
                          ctx_map: BlockCtxMap):
    """Returns (ctx, val) arrays or None on fallback."""
    lib = _lib()
    if lib is None:
        return None
    coeffs = np.zeros(prep["total_coeffs"], np.int32)
    by_pos = {(b.by, b.bx): b for b in blocks}
    for i in range(prep["n"]):
        b = by_pos[(int(prep["blk_by"][i]), int(prep["blk_bx"][i]))]
        off = prep["blk_coeff_off"][i]
        coeffs[off:off + b.coeffs.size] = b.coeffs.ravel()
    cap = prep["total_coeffs"] + 3 * prep["n"]
    out_ctx = np.zeros(cap, np.int32)
    out_val = np.zeros(cap, np.uint32)
    cnt = lib.vardct_tokenize_ac(
        bw, bh, prep["n"],
        _p(prep["blk_bx"], C.c_int32), _p(prep["blk_by"], C.c_int32),
        _p(prep["blk_cx"], C.c_int32), _p(prep["blk_cy"], C.c_int32),
        _p(prep["blk_ctx"], C.c_int32),
        _p(prep["blk_order_off"], C.c_int32),
        _p(prep["blk_coeff_off"], C.c_int64),
        _p(prep["orders"], C.c_int32), ctx_map.num_ctxs,
        _p(coeffs, C.c_int32),
        _p(out_ctx, C.c_int32), _p(out_val, C.c_uint32), cap)
    if cnt < 0:
        return None
    return out_ctx[:cnt], out_val[:cnt]
