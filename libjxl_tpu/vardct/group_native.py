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


def prepare_blocks(strategies: np.ndarray, raw_quant: np.ndarray,
                   ctx_map: BlockCtxMap, orders: dict,
                   qdc: np.ndarray | None = None):
    """Precompute per-block arrays + flattened orders for the native
    coder. Returns dict or None if unsupported (non-default dc ctx)."""
    ys, xs = np.nonzero(strategies >= 0)
    n = len(ys)
    blk_bx = xs.astype(np.int32)
    blk_by = ys.astype(np.int32)
    strat = strategies[ys, xs].astype(np.int32)
    blk_cx = np.array([acs.COVERED_X[s] for s in strat], np.int32)
    blk_cy = np.array([acs.COVERED_Y[s] for s in strat], np.int32)
    # Flatten orders.
    order_parts = []
    order_index = {}
    off = 0
    for key, arr in orders.items():
        order_index[key] = off
        order_parts.append(np.asarray(arr, np.int32))
        off += len(arr)
    flat_orders = np.concatenate(order_parts) if order_parts \
        else np.zeros(1, np.int32)
    blk_ctx = np.zeros((n, 3), np.int32)
    blk_order_off = np.zeros((n, 3), np.int32)
    blk_coeff_off = np.zeros(n, np.int64)
    total = 0
    for i in range(n):
        s = int(strat[i])
        ord_b = acs.STRATEGY_ORDER[s]
        size = acs.COVERED_X[s] * acs.COVERED_Y[s] * 64
        dc_idx = ctx_map.dc_context(qdc[:, blk_by[i], blk_bx[i]]) \
            if qdc is not None else 0
        for c in range(3):
            blk_ctx[i, c] = ctx_map.context(
                dc_idx, int(raw_quant[blk_by[i], blk_bx[i]]), ord_b, c)
            blk_order_off[i, c] = order_index[(ord_b, c)]
        blk_coeff_off[i] = total
        total += 3 * size
    return {
        "n": n, "blk_bx": blk_bx, "blk_by": blk_by, "blk_cx": blk_cx,
        "blk_cy": blk_cy, "strat": strat, "blk_ctx": blk_ctx,
        "blk_order_off": blk_order_off, "blk_coeff_off": blk_coeff_off,
        "orders": flat_orders, "total_coeffs": total,
    }


def native_decode_group(data: bytes, bit_pos: int, codes, bw: int, bh: int,
                        prep: dict, ctx_map: BlockCtxMap,
                        ctx_offset: int) -> tuple[list, int] | None:
    """Returns (blocks, new_bit_pos) or None on fallback."""
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
    blocks = []
    for i in range(prep["n"]):
        s = int(prep["strat"][i])
        size = acs.COVERED_X[s] * acs.COVERED_Y[s] * 64
        off = prep["blk_coeff_off"][i]
        blocks.append(CoeffBlock(
            int(prep["blk_bx"][i]), int(prep["blk_by"][i]), s,
            coeffs[off:off + 3 * size].reshape(3, size)))
    return blocks, pos


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
