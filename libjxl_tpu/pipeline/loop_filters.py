"""Decoder loop filters: gaborish 3x3 + edge-preserving filter passes.

Reference: lib/jxl/render_pipeline/stage_gaborish.cc (normalized 3x3),
stage_epf.cc (EPF0 7x7 / EPF1 5x5 / EPF2 3x3 with SAD weights),
epf.cc ComputeSigma. Whole-image numpy with mirrored borders — the
row-streaming structure of the reference maps to fused halo'ed tiles
on TPU (ops/).
"""

from __future__ import annotations

import numpy as np

INV_SIGMA_NUM = -1.1715728752538099024
MIN_SIGMA = -3.90524291751269967465540850526868
SIGMA_PAD_VAL = 0.0


def gaborish(img: np.ndarray, lf) -> np.ndarray:
    """(3, H, W) -> filtered. stage_gaborish.cc:31-113."""
    weights = [
        (1.0, lf.gab_x_weight1, lf.gab_x_weight2),
        (1.0, lf.gab_y_weight1, lf.gab_y_weight2),
        (1.0, lf.gab_b_weight1, lf.gab_b_weight2),
    ]
    out = np.empty_like(img)
    for c in range(3):
        w0, w1, w2 = weights[c]
        div = w0 + 4 * (w1 + w2)
        w0, w1, w2 = w0 / div, w1 / div, w2 / div
        p = np.pad(img[c], 1, mode="symmetric")
        out[c] = (p[1:-1, 1:-1] * w0
                  + (p[1:-1, :-2] + p[1:-1, 2:] + p[:-2, 1:-1]
                     + p[2:, 1:-1]) * w1
                  + (p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2]
                     + p[2:, 2:]) * w2)
    return out


def compute_sigma_map(lf, raw_quant: np.ndarray, sharpness: np.ndarray,
                      quant_scale: float) -> np.ndarray:
    """Per-8x8-block 1/sigma (epf.cc:39-80). sharpness: (h, w) uint."""
    lut = np.array(lf.epf_sharp_lut, np.float32)
    sigma_quant = lf.epf_quant_mul / (quant_scale
                                      * raw_quant.astype(np.float32)
                                      * INV_SIGMA_NUM)
    sigma = sigma_quant * lut[np.clip(sharpness, 0, len(lut) - 1)]
    sigma = np.minimum(sigma, -1e-4)
    return 1.0 / sigma


def _sad_mul_map(h: int, w: int, sm: float, bsm: float) -> np.ndarray:
    mul = np.full((h, w), sm, np.float32)
    xb = (np.arange(w) % 8 == 0) | (np.arange(w) % 8 == 7)
    yb = (np.arange(h) % 8 == 0) | (np.arange(h) % 8 == 7)
    mul[:, xb] = bsm
    mul[yb, :] = bsm
    return mul


def _weight(sad: np.ndarray, inv_sigma: np.ndarray) -> np.ndarray:
    return np.maximum(sad * inv_sigma + 1.0, 0.0)


def _block_expand(block_map: np.ndarray, h: int, w: int) -> np.ndarray:
    e = np.repeat(np.repeat(block_map, 8, 0), 8, 1)
    return e[:h, :w]


def epf0(img: np.ndarray, lf, inv_sigma_blocks: np.ndarray) -> np.ndarray:
    """7x7 filter: 12 candidate offsets, plus-shaped SADs
    (stage_epf.cc:54-193)."""
    _, h, w = img.shape
    sm = lf.epf_pass0_sigma_scale * 1.65
    inv_sigma = _block_expand(inv_sigma_blocks, h, w) \
        * _sad_mul_map(h, w, sm, sm * lf.epf_border_sad_mul)
    skip = _block_expand(inv_sigma_blocks, h, w) < MIN_SIGMA

    p = np.pad(img, ((0, 0), (3, 3), (3, 3)), mode="symmetric")

    def at(dy, dx):
        return p[:, 3 + dy:3 + dy + h, 3 + dx:3 + dx + w]

    scales = np.array(lf.epf_channel_scale, np.float32)[:, None, None]
    plus = [(0, 0), (-1, 0), (0, -1), (1, 0), (0, 1)]
    offsets = [(-2, 0), (-1, -1), (-1, 0), (-1, 1), (0, -2), (0, -1),
               (0, 1), (0, 2), (1, -1), (1, 0), (1, 1), (2, 0)]
    X = img.copy()
    wsum = np.ones((h, w), np.float32)
    center = img
    # Shared shifted-difference fields: |at(p) - at(s+p)| is the
    # candidate-offset difference field shifted by p, so each SAD is 5
    # slices of one precomputed array (identical sums, ~4x less work).
    pw = p.shape[2]
    ph = p.shape[1]
    for (sy, sx) in offsets:
        dfull = (np.abs(p[:, max(0, -sy):ph - max(0, sy),
                          max(0, -sx):pw - max(0, sx)]
                        - p[:, max(0, sy):ph - max(0, -sy),
                            max(0, sx):pw - max(0, -sx)])
                 * scales).sum(axis=0)
        oy, ox = 3 - max(0, -sy), 3 - max(0, -sx)
        sad = np.zeros((h, w), np.float32)
        for (py, px) in plus:
            sad += dfull[oy + py:oy + py + h, ox + px:ox + px + w]
        wgt = _weight(sad, inv_sigma)
        X += wgt[None] * at(sy, sx)
        wsum += wgt
    out = X / wsum[None]
    return np.where(skip[None], center, out)


def epf1(img: np.ndarray, lf, inv_sigma_blocks: np.ndarray) -> np.ndarray:
    """5x5 filter: 4 candidates (N/W/E/S), plus-shaped SADs
    (stage_epf.cc:197-372)."""
    _, h, w = img.shape
    sm = 1.65  # pass 1 uses no extra sigma scale (stage_epf.cc:230)
    inv_sigma = _block_expand(inv_sigma_blocks, h, w) \
        * _sad_mul_map(h, w, sm, sm * lf.epf_border_sad_mul)
    skip = _block_expand(inv_sigma_blocks, h, w) < MIN_SIGMA

    p = np.pad(img, ((0, 0), (2, 2), (2, 2)), mode="symmetric")

    def at(dy, dx):
        return p[:, 2 + dy:2 + dy + h, 2 + dx:2 + dx + w]

    scales = np.array(lf.epf_channel_scale, np.float32)[:, None, None]
    plus = [(0, 0), (-1, 0), (0, -1), (1, 0), (0, 1)]
    cands = [(-1, 0), (0, -1), (0, 1), (1, 0)]
    X = img.copy()
    wsum = np.ones((h, w), np.float32)
    ph, pw = p.shape[1], p.shape[2]
    for (sy, sx) in cands:
        dfull = (np.abs(p[:, max(0, -sy):ph - max(0, sy),
                          max(0, -sx):pw - max(0, sx)]
                        - p[:, max(0, sy):ph - max(0, -sy),
                            max(0, sx):pw - max(0, -sx)])
                 * scales).sum(axis=0)
        oy, ox = 2 - max(0, -sy), 2 - max(0, -sx)
        sad = np.zeros((h, w), np.float32)
        for (py, px) in plus:
            sad += dfull[oy + py:oy + py + h, ox + px:ox + px + w]
        wgt = _weight(sad, inv_sigma)
        X += wgt[None] * at(sy, sx)
        wsum += wgt
    out = X / wsum[None]
    return np.where(skip[None], img, out)


def epf2(img: np.ndarray, lf, inv_sigma_blocks: np.ndarray) -> np.ndarray:
    """3x3 filter: 4 candidates with single-pixel SADs
    (stage_epf.cc:382-500)."""
    _, h, w = img.shape
    sm = lf.epf_pass2_sigma_scale * 1.65
    inv_sigma = _block_expand(inv_sigma_blocks, h, w) \
        * _sad_mul_map(h, w, sm, sm * lf.epf_border_sad_mul)
    skip = _block_expand(inv_sigma_blocks, h, w) < MIN_SIGMA

    p = np.pad(img, ((0, 0), (1, 1), (1, 1)), mode="symmetric")

    def at(dy, dx):
        return p[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    scales = np.array(lf.epf_channel_scale, np.float32)[:, None, None]
    cands = [(-1, 0), (0, -1), (0, 1), (1, 0)]
    X = img.copy()
    wsum = np.ones((h, w), np.float32)
    for (sy, sx) in cands:
        cand = at(sy, sx)
        sad = (np.abs(cand - img) * scales).sum(axis=0)
        wgt = _weight(sad, inv_sigma)
        X += wgt[None] * cand
        wsum += wgt
    out = X / wsum[None]
    return np.where(skip[None], img, out)


def _native_filters():
    """Bound native lib with host_gaborish/host_epf, or None."""
    import ctypes as C
    import os
    if os.environ.get("LIBJXL_TPU_NO_NATIVE_FILTERS"):
        return None
    try:
        from libjxl_tpu.native.bindings import get_lib
        lib = get_lib()
    except Exception:
        return None
    if lib is None:
        return None
    if not hasattr(lib, "_filters_bound"):
        F = C.POINTER(C.c_float)
        D = C.POINTER(C.c_double)
        lib.host_gaborish.restype = None
        lib.host_gaborish.argtypes = [F, F, C.c_int64, C.c_int64, D]
        lib.host_epf.restype = None
        lib.host_epf.argtypes = [F, F, C.c_int64, C.c_int64, F,
                                 C.c_int64, C.c_int64, C.c_int,
                                 C.c_double, C.c_double, C.c_double, D]
        lib._filters_bound = True
    return lib


def gaborish_native(img: np.ndarray, lf) -> np.ndarray | None:
    """Fused C++ gaborish; None when the native module is missing."""
    import ctypes as C
    lib = _native_filters()
    if lib is None:
        return None
    _, h, w = img.shape
    src = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(src)
    wts = np.array([[lf.gab_x_weight1, lf.gab_x_weight2],
                    [lf.gab_y_weight1, lf.gab_y_weight2],
                    [lf.gab_b_weight1, lf.gab_b_weight2]], np.float64)
    lib.host_gaborish(src.ctypes.data_as(C.POINTER(C.c_float)),
                      out.ctypes.data_as(C.POINTER(C.c_float)),
                      h, w, wts.ctypes.data_as(C.POINTER(C.c_double)))
    return out


def epf_native(img: np.ndarray, lf,
               inv_sigma_blocks: np.ndarray) -> np.ndarray | None:
    """Fused C++ EPF sequence; None when native is missing."""
    import ctypes as C
    lib = _native_filters()
    if lib is None:
        return None
    _, h, w = img.shape
    src = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(src)
    isb = np.ascontiguousarray(inv_sigma_blocks, np.float32)
    cs = np.asarray(lf.epf_channel_scale, np.float64)
    lib.host_epf(src.ctypes.data_as(C.POINTER(C.c_float)),
                 out.ctypes.data_as(C.POINTER(C.c_float)),
                 h, w, isb.ctypes.data_as(C.POINTER(C.c_float)),
                 isb.shape[0], isb.shape[1], int(lf.epf_iters),
                 float(lf.epf_pass0_sigma_scale),
                 float(lf.epf_pass2_sigma_scale),
                 float(lf.epf_border_sad_mul),
                 cs.ctypes.data_as(C.POINTER(C.c_double)))
    return out


def apply_loop_filters(img: np.ndarray, lf, raw_quant: np.ndarray,
                       strategies: np.ndarray, quantizer, fd,
                       sharpness: np.ndarray | None = None) -> np.ndarray:
    """Gaborish then EPF passes in reference stage order
    (dec_cache.cc:150-170: EPF0 if iters>=3, EPF1 if >=1, EPF2 if >=2)."""
    out = img
    if lf.gab:
        native = gaborish_native(out, lf)
        out = native if native is not None else gaborish(out, lf)
    if lf.epf_iters > 0:
        if sharpness is None:
            sharpness = np.zeros_like(raw_quant)
        inv_sigma = compute_sigma_map(lf, raw_quant, sharpness,
                                      quantizer.global_scale_float)
        native = epf_native(out, lf, inv_sigma)
        if native is not None:
            return native
        if lf.epf_iters >= 3:
            out = epf0(out, lf, inv_sigma)
        if lf.epf_iters >= 1:
            out = epf1(out, lf, inv_sigma)
        if lf.epf_iters >= 2:
            out = epf2(out, lf, inv_sigma)
    return out
