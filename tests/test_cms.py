"""CMS: ICC synthesis for enum spaces, arbitrary-ICC application,
compressed-ICC + gain-map APIs, brob boxes (VERDICT #6)."""

import numpy as np
import pytest

from libjxl_tpu.color import cms

pytestmark = pytest.mark.skipif(not cms.available(),
                                reason="liblcms2 not installed")


def _img():
    rng = np.random.default_rng(2)
    return np.clip(rng.normal(128, 50, (48, 48, 3)), 0, 255
                   ).astype(np.uint8)


def test_enum_icc_synthesis_linear_matches_formula():
    from libjxl_tpu.color.color_encoding import ColorEncoding
    from libjxl_tpu.color.xyb import linear_to_srgb
    px = np.random.default_rng(0).uniform(0, 1, (16, 16, 3)
                                          ).astype(np.float32)
    icc = cms.synthesize_icc(ColorEncoding.linear_srgb())
    out = cms.convert_pixels(px, icc, cms.srgb_icc())
    want = linear_to_srgb(px.transpose(2, 0, 1)).transpose(1, 2, 0)
    assert np.abs(out - want).max() < 0.01


def test_decode_with_custom_icc_and_convert():
    """Pixels ride in a P3 ICC space; decoding + CMS conversion matches
    converting the original directly."""
    from libjxl_tpu.api.simple import decode, encode
    from libjxl_tpu.color.color_encoding import ColorEncoding, Primaries
    ce = ColorEncoding.srgb()
    ce.primaries = int(Primaries.P3)
    ce.all_default = False
    p3_icc = cms.synthesize_icc(ce)
    img = _img()
    data = encode(img, lossless=True, effort=3, icc=p3_icc)
    res = decode(data)
    assert res.icc is not None
    assert np.array_equal(res.pixels, img)   # samples unchanged
    got = res.to_srgb()
    want = cms.convert_pixels(img.astype(np.float32) / 255.0, p3_icc,
                              cms.srgb_icc())
    assert np.abs(got - want).max() < 1e-4


def test_icc_roundtrips_through_reference_decoder():
    refjxl = pytest.importorskip("libjxl_tpu.extras.refjxl")
    if not refjxl.available():
        pytest.skip("system libjxl not installed")
    from libjxl_tpu.api.simple import encode
    from libjxl_tpu.color.color_encoding import ColorEncoding, Primaries
    ce = ColorEncoding.srgb()
    ce.primaries = int(Primaries.P3)
    ce.all_default = False
    p3_icc = cms.synthesize_icc(ce)
    img = _img()
    data = encode(img, lossless=True, effort=3, icc=p3_icc)
    res = refjxl.decode(data, dtype="uint8", want_icc=True)
    assert np.array_equal(res.pixels, img)
    assert res.icc == p3_icc   # embedded profile survives verbatim


def test_compressed_icc_api_roundtrip():
    from libjxl_tpu.api.extras_api import (
        icc_profile_decode, icc_profile_encode)
    icc = cms.srgb_icc()
    enc = icc_profile_encode(icc)
    assert icc_profile_decode(enc) == icc
    assert len(enc) < len(icc)


def test_gain_map_bundle_roundtrip():
    from libjxl_tpu.api.extras_api import (
        GainMapBundle, gain_map_read_bundle, gain_map_write_bundle,
        icc_profile_encode)
    from libjxl_tpu.api.simple import encode
    from libjxl_tpu.color.color_encoding import ColorEncoding
    gm = encode(_img()[..., :1][..., 0], distance=1.0, effort=1)
    b = GainMapBundle(
        jhgm_version=0,
        gain_map_metadata=b"<x:xmpmeta>hdr gain map</x:xmpmeta>",
        color_encoding=ColorEncoding.linear_srgb(),
        alt_icc=icc_profile_encode(cms.srgb_icc()),
        gain_map=gm)
    blob = gain_map_write_bundle(b)
    back = gain_map_read_bundle(blob)
    assert back.jhgm_version == 0
    assert back.gain_map_metadata == b.gain_map_metadata
    assert back.alt_icc == b.alt_icc
    assert back.gain_map == gm
    assert back.color_encoding.tf.transfer_function == \
        b.color_encoding.tf.transfer_function


def test_brob_box_roundtrip():
    from libjxl_tpu.api.simple import encode
    from libjxl_tpu.container.boxes import pack_container, unpack_container
    cs = encode(_img(), distance=1.0, effort=1)
    exif = b"\x00\x00\x00\x00II*\x00" + b"exif" * 60
    c = pack_container(cs, exif=exif, xml=[b"<meta/>" * 40],
                       compress_boxes=True)
    u = unpack_container(c)
    assert u.exif == exif
    assert u.xml == [b"<meta/>" * 40]
    assert u.codestream == cs


class TestCmyk:
    """CMYK via kBlack extra channel (color_encoding_internal.h IsCMYK,
    jxl_cms.cc:260 inverted-sample convention)."""

    def test_cmyk_lossless_roundtrip(self):
        from libjxl_tpu.api.simple import decode, encode
        rng = np.random.default_rng(5)
        cmyk8 = (rng.random((48, 64, 4)) * 255).astype(np.uint8)
        data = encode(cmyk8, lossless=True, cmyk=True)
        res = decode(data)
        assert res.is_cmyk
        back = np.round(res.to_cmyk() * 255).astype(np.uint8)
        assert np.array_equal(back, cmyk8)

    def test_cmyk_to_srgb_naive(self):
        from libjxl_tpu.api.simple import decode, encode
        cmyk = np.zeros((8, 8, 4), np.uint8)
        cmyk[:, :, 3] = 255  # full black ink
        data = encode(cmyk, lossless=True, cmyk=True)
        srgb = decode(data).to_srgb()
        assert srgb.max() < 1e-3  # pure black
        cmyk[:] = 0  # no ink = white
        srgb = decode(encode(cmyk, lossless=True, cmyk=True)).to_srgb()
        assert srgb.min() > 0.99

    def test_cmyk_lossy(self):
        from libjxl_tpu.api.simple import decode, encode
        rng = np.random.default_rng(6)
        base = np.clip(rng.normal(128, 30, (40, 56, 1)), 0, 255)
        cmyk8 = np.repeat(base, 4, 2).astype(np.uint8)
        data = encode(cmyk8, distance=1.0, cmyk=True)
        res = decode(data)
        back = np.round(res.to_cmyk() * 255)
        assert np.abs(back - cmyk8).mean() < 4.0
        # K channel is coded losslessly (extra channels are modular).
        assert np.array_equal(np.round(res.to_cmyk()[..., 3] * 255),
                              cmyk8[..., 3])
