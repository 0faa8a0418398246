"""Brotli (de)compression via the system libbrotli, through ctypes.

Used by the container layer for `brob` boxes and by the JPEG
reconstruction (`jbrd`) codec (reference: lib/jxl/box_content_decoder.cc,
lib/jxl/jpeg/enc_jpeg_data.cc:309-340).
"""

from __future__ import annotations

import ctypes

_enc = None
_dec = None
for _name in ("libbrotlienc.so.1", "libbrotlienc.so"):
    try:
        _enc = ctypes.CDLL(_name)
        break
    except OSError:
        continue
for _name in ("libbrotlidec.so.1", "libbrotlidec.so"):
    try:
        _dec = ctypes.CDLL(_name)
        break
    except OSError:
        continue

if _enc is not None:
    _enc.BrotliEncoderCompress.restype = ctypes.c_int
    _enc.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
    _enc.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
    _enc.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
if _dec is not None:
    _dec.BrotliDecoderDecompress.restype = ctypes.c_int
    _dec.BrotliDecoderDecompress.argtypes = [
        ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]


def available() -> bool:
    return _enc is not None and _dec is not None


def compress(data: bytes, quality: int = 9, window: int = 22) -> bytes:
    """One-shot brotli compression."""
    if _enc is None:
        raise RuntimeError("libbrotlienc not available")
    cap = _enc.BrotliEncoderMaxCompressedSize(len(data)) or (len(data) + 1024)
    out = ctypes.create_string_buffer(cap)
    out_len = ctypes.c_size_t(cap)
    # mode 0 = BROTLI_MODE_GENERIC
    ok = _enc.BrotliEncoderCompress(quality, window, 0, len(data), data,
                                    ctypes.byref(out_len), out)
    if not ok:
        raise RuntimeError("brotli compression failed")
    return out.raw[:out_len.value]


def decompress(data: bytes, max_output: int = 1 << 28) -> bytes:
    """One-shot brotli decompression (bounded output, grows as needed)."""
    if _dec is None:
        raise RuntimeError("libbrotlidec not available")
    cap = max(4 * len(data) + 1024, 1 << 16)
    while True:
        out = ctypes.create_string_buffer(cap)
        out_len = ctypes.c_size_t(cap)
        # 1 = BROTLI_DECODER_RESULT_SUCCESS
        rc = _dec.BrotliDecoderDecompress(len(data), data,
                                          ctypes.byref(out_len), out)
        if rc == 1:
            return out.raw[:out_len.value]
        if cap >= max_output:
            raise ValueError("brotli stream too large or corrupt")
        cap *= 4
