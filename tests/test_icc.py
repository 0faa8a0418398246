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


class TestColorDescription:
    """lib/extras/dec/color_description.cc ParseDescription."""

    def test_parse_roundtrip(self):
        from libjxl_tpu.color.color_description import (
            describe_color_encoding, parse_color_description)
        for s in ("RGB_D65_SRG_Rel_SRG", "RGB_D65_202_Rel_PeQ",
                  "Gra_D65_Rel_SRG", "XYB_Per", "RGB_D65_DCI_Rel_SRG",
                  "RGB_0.3127;0.329_SRG_Rel_g2.2"):
            assert describe_color_encoding(parse_color_description(s)) == s

    def test_aliases(self):
        from libjxl_tpu.color.color_description import (
            parse_color_description)
        from libjxl_tpu.color.color_encoding import (
            Primaries, TransferFunction, WhitePoint)
        srgb = parse_color_description("sRGB")
        assert srgb.primaries == Primaries.SRGB
        assert srgb.tf.transfer_function == TransferFunction.SRGB
        p3 = parse_color_description("DisplayP3")
        assert p3.primaries == Primaries.P3
        pro = parse_color_description("ProPhoto")
        assert pro.white_point == WhitePoint.CUSTOM
        assert abs(pro.white.as_float()[0] - 0.345669) < 1e-6
        assert pro.tf.have_gamma

    def test_bad_strings(self):
        from libjxl_tpu.base.errors import JxlError
        from libjxl_tpu.color.color_description import (
            parse_color_description)
        import pytest
        for s in ("BOGUS_D65_SRG_Rel_SRG", "RGB", "RGB_D65_SRG_Rel_XXX",
                  "RGB_D65_SRG_Nope_SRG", "RGB_1;2;3_SRG_Rel_SRG"):
            with pytest.raises(JxlError):
                parse_color_description(s)

    def test_encode_with_description(self):
        import numpy as np

        from libjxl_tpu.api.simple import decode, encode
        from libjxl_tpu.color.color_encoding import TransferFunction
        rng = np.random.default_rng(2)
        img = np.clip(rng.normal(128, 30, (32, 40, 3)), 0, 255
                      ).astype(np.uint8)
        data = encode(img, lossless=True,
                      color_encoding="RGB_D65_202_Rel_PeQ")
        res = decode(data)
        np.testing.assert_array_equal(res.pixels, img)
        ce = res.metadata.m.color_encoding
        assert ce.tf.transfer_function == TransferFunction.PQ
