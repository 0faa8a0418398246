"""Compressed ICC codec (reference: icc_codec.cc, icc_codec_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.color.icc_codec import (
    predict_icc, read_icc, unpredict_icc, write_icc,
)


def _fake_icc(n_body=300, seed=3):
    rng = np.random.default_rng(seed)
    header = bytearray(128)
    total = 128 + n_body
    header[0:4] = total.to_bytes(4, "big")
    header[4:8] = b"ADBE"
    header[12:16] = b"mntr"
    header[16:20] = b"RGB "
    header[36:40] = b"acsp"
    body = rng.integers(0, 256, n_body, dtype=np.uint8).tobytes()
    return bytes(header) + body


def test_predict_unpredict_roundtrip():
    icc = _fake_icc()
    assert unpredict_icc(predict_icc(icc)) == icc


def test_bitstream_roundtrip():
    for n in (0, 10, 500, 5000):
        icc = _fake_icc(n, seed=n + 1)
        w = BitWriter()
        write_icc(icc, w)
        w.align_to_byte()
        r = BitReader(w.get_bytes())
        assert read_icc(r) == icc


def test_tiny_profile():
    icc = b"\x00\x00\x00\x08ABCD"
    w = BitWriter()
    write_icc(icc, w)
    w.align_to_byte()
    assert read_icc(BitReader(w.get_bytes())) == icc


def test_corrupt_icc_raises():
    icc = _fake_icc()
    w = BitWriter()
    write_icc(icc, w)
    w.align_to_byte()
    data = bytearray(w.get_bytes())
    data = data[:len(data) // 2]
    with pytest.raises(Exception):
        read_icc(BitReader(bytes(data)))


def test_codestream_with_icc():
    from libjxl_tpu.api import decode
    from libjxl_tpu.api.simple import CodecMetadata
    from libjxl_tpu.color.color_encoding import ColorEncoding
    from libjxl_tpu.frame.encode_frame import encode_modular_frame
    from libjxl_tpu.frame.headers import (
        BitDepth, write_codestream_headers)

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    meta = CodecMetadata()
    meta.size.set(24, 20)
    meta.m.bit_depth = BitDepth.uint(8)
    meta.m.xyb_encoded = False
    meta.m.color_encoding = ColorEncoding.srgb(is_gray=False)
    meta.m.color_encoding.want_icc = True
    meta.icc_profile = _fake_icc()
    w = BitWriter()
    write_codestream_headers(meta, w)
    encode_modular_frame([img[:, :, c].astype(np.int32) for c in range(3)],
                         meta, w)
    w.align_to_byte()
    res = decode(w.get_bytes())
    assert res.metadata.icc_profile == meta.icc_profile
    np.testing.assert_array_equal(res.pixels, img)
