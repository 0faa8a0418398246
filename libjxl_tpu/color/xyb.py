"""XYB <-> linear RGB (numpy reference; jax version in ops/xyb.py).

Reference: lib/jxl/enc_xyb.cc (LinearRGBToXYB: absorbance matmul + bias,
clamp, cbrt, opponent split) and dec_xyb-inl.h (XybToRgb). The B channel
carries cbrt(S)-cbrt(bias) directly; the B-Y opponent subtraction
happens in coefficient space via CfL base_correlation_b == 1.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.color.constants import (
    DEFAULT_INVERSE_OPSIN_MATRIX, OPSIN_ABSORBANCE_BIAS,
    OPSIN_ABSORBANCE_MATRIX,
)


def linear_rgb_to_xyb(rgb: np.ndarray) -> np.ndarray:
    """rgb: (3, H, W) linear sRGB in [0,1] -> xyb (3, H, W)."""
    m = OPSIN_ABSORBANCE_MATRIX.astype(np.float64)
    bias = OPSIN_ABSORBANCE_BIAS.astype(np.float64)
    mixed = np.tensordot(m, rgb.astype(np.float64), axes=1) \
        + bias[:, None, None]
    mixed = np.maximum(mixed, 0.0)
    cbrt = np.cbrt(mixed) - np.cbrt(bias)[:, None, None]
    x = 0.5 * (cbrt[0] - cbrt[1])
    y = 0.5 * (cbrt[0] + cbrt[1])
    b = cbrt[2]
    return np.stack([x, y, b]).astype(np.float32)


def xyb_to_linear_rgb(xyb: np.ndarray,
                      inverse_matrix: np.ndarray | None = None,
                      ) -> np.ndarray:
    """xyb: (3, H, W) -> linear RGB (3, H, W)."""
    if inverse_matrix is None:
        inverse_matrix = DEFAULT_INVERSE_OPSIN_MATRIX
    bias = OPSIN_ABSORBANCE_BIAS.astype(np.float64)
    bias_cbrt = np.cbrt(bias)
    x, y, b = xyb.astype(np.float64)
    gamma_l = y + x + bias_cbrt[0]
    gamma_m = y - x + bias_cbrt[1]
    gamma_s = b + bias_cbrt[2]
    mixed = np.stack([gamma_l ** 3 - bias[0],
                      gamma_m ** 3 - bias[1],
                      gamma_s ** 3 - bias[2]])
    rgb = np.tensordot(inverse_matrix.astype(np.float64), mixed, axes=1)
    return rgb.astype(np.float32)


def xyb_to_srgb_px_native(xyb: np.ndarray, maxval: int,
                          dtype) -> np.ndarray | None:
    """Fused native XYB -> linear -> sRGB -> quantized (H, W, 3)
    pixels (jxl_native.cpp xyb_to_srgb_px); None when unavailable."""
    import ctypes as C
    import os
    if os.environ.get("LIBJXL_TPU_NO_NATIVE_COLOR"):
        return None
    try:
        from libjxl_tpu.native.bindings import get_lib
        lib = get_lib()
    except Exception:
        return None
    if lib is None:
        return None
    if not hasattr(lib, "_srgbpx_bound"):
        lib.xyb_to_srgb_px.restype = None
        lib.xyb_to_srgb_px.argtypes = [
            C.POINTER(C.c_float), C.c_int64, C.POINTER(C.c_double),
            C.POINTER(C.c_double), C.POINTER(C.c_uint8),
            C.POINTER(C.c_uint16), C.c_int32]
        lib._srgbpx_bound = True
    _, h, w = xyb.shape
    src = np.ascontiguousarray(xyb, np.float32)
    inv = np.ascontiguousarray(DEFAULT_INVERSE_OPSIN_MATRIX, np.float64)
    bias = np.ascontiguousarray(OPSIN_ABSORBANCE_BIAS, np.float64)
    out = np.empty((h, w, 3), dtype)
    lib.xyb_to_srgb_px(
        src.ctypes.data_as(C.POINTER(C.c_float)), h * w,
        inv.ctypes.data_as(C.POINTER(C.c_double)),
        bias.ctypes.data_as(C.POINTER(C.c_double)),
        out.ctypes.data_as(C.POINTER(C.c_uint8))
        if dtype == np.uint8 else None,
        None if dtype == np.uint8
        else out.ctypes.data_as(C.POINTER(C.c_uint16)),
        maxval)
    return out


_SRGB_LUT8 = None


def srgb_to_linear_u8(img: np.ndarray) -> np.ndarray:
    """sRGB EOTF via a 256-entry LUT for uint8 samples (bit-identical
    to srgb_to_linear(img / 255))."""
    global _SRGB_LUT8
    if _SRGB_LUT8 is None:
        _SRGB_LUT8 = srgb_to_linear(np.arange(256, dtype=np.float64)
                                    / 255.0)
    return _SRGB_LUT8[img]


def srgb_to_linear(srgb: np.ndarray) -> np.ndarray:
    """sRGB EOTF (cms/transfer_functions-inl.h TF_SRGB)."""
    srgb = np.asarray(srgb, np.float64)
    return np.where(srgb <= 0.04045, srgb / 12.92,
                    ((srgb + 0.055) / 1.055) ** 2.4).astype(np.float32)


def linear_to_srgb(linear: np.ndarray) -> np.ndarray:
    linear = np.asarray(linear, np.float64)
    lin = np.maximum(linear, 0.0)
    return np.where(lin <= 0.0031308, lin * 12.92,
                    1.055 * lin ** (1 / 2.4) - 0.055).astype(np.float32)


def linear_to_srgb_ext(linear: np.ndarray) -> np.ndarray:
    """Sign-symmetric sRGB OETF on UNCLAMPED linear values
    (cms/transfer_functions-inl.h TF_SRGB applies the curve to |x| and
    restores the sign) — out-of-gamut samples must survive animation
    blending and only clip at display."""
    linear = np.asarray(linear, np.float64)
    a = np.abs(linear)
    enc = np.where(a <= 0.0031308, a * 12.92,
                   1.055 * np.maximum(a, 1e-12) ** (1 / 2.4) - 0.055)
    return (np.sign(linear) * enc).astype(np.float32)


def srgb8_to_xyb_native(img: np.ndarray) -> np.ndarray | None:
    """Fused sRGB-u8 -> linear (256-LUT) -> XYB, one native pass
    (jxl_native.cpp srgb8_to_xyb; same f64 op order as
    srgb_to_linear_u8 + linear_rgb_to_xyb). img: (H, W, 3) uint8;
    returns (3, H, W) float32, or None when native is unavailable."""
    import ctypes as C
    global _SRGB_LUT8
    try:
        from libjxl_tpu.native.bindings import get_lib
        lib = get_lib()
    except Exception:
        return None
    if lib is None or img.dtype != np.uint8 or img.shape[-1] != 3:
        return None
    if not hasattr(lib, "_srgb8_xyb_bound"):
        lib.srgb8_to_xyb.restype = None
        lib.srgb8_to_xyb.argtypes = [
            C.POINTER(C.c_uint8), C.c_int64, C.POINTER(C.c_float),
            C.POINTER(C.c_double), C.POINTER(C.c_double),
            C.POINTER(C.c_double), C.POINTER(C.c_float)]
        lib._srgb8_xyb_bound = True
    if _SRGB_LUT8 is None:
        _SRGB_LUT8 = srgb_to_linear(np.arange(256, dtype=np.float64)
                                    / 255.0)
    lut = np.ascontiguousarray(_SRGB_LUT8, np.float32)
    m = np.ascontiguousarray(OPSIN_ABSORBANCE_MATRIX, np.float64)
    bias = np.ascontiguousarray(OPSIN_ABSORBANCE_BIAS, np.float64)
    cb = np.cbrt(bias)
    h, w, _ = img.shape
    src = np.ascontiguousarray(img)
    out = np.empty((3, h, w), np.float32)
    lib.srgb8_to_xyb(
        src.ctypes.data_as(C.POINTER(C.c_uint8)), h * w,
        lut.ctypes.data_as(C.POINTER(C.c_float)),
        m.ctypes.data_as(C.POINTER(C.c_double)),
        bias.ctypes.data_as(C.POINTER(C.c_double)),
        cb.ctypes.data_as(C.POINTER(C.c_double)),
        out.ctypes.data_as(C.POINTER(C.c_float)))
    return out
