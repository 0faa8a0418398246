"""YCbCr modular frames with chroma subsampling
(reference: stage_ycbcr.cc, stage_chroma_upsampling.cc)."""

import numpy as np
import pytest

from libjxl_tpu.api import decode
from libjxl_tpu.api.simple import CodecMetadata
from libjxl_tpu.bitstream.bit_io import BitWriter
from libjxl_tpu.color.ycbcr import rgb_to_ycbcr, ycbcr_to_rgb
from libjxl_tpu.frame.encode_frame import encode_modular_frame
from libjxl_tpu.frame.headers import BitDepth, write_codestream_headers


def _encode_ycbcr(img, modes):
    h, w = img.shape[:2]
    rgbf = img.astype(np.float64) / 255.0
    cb, y, cr = rgb_to_ycbcr(rgbf[:, :, 0], rgbf[:, :, 1], rgbf[:, :, 2])
    meta = CodecMetadata()
    meta.size.set(w, h)
    meta.m.bit_depth = BitDepth.uint(8)
    meta.m.xyb_encoded = False
    from libjxl_tpu.color.color_encoding import ColorEncoding
    meta.m.color_encoding = ColorEncoding.srgb(is_gray=False)

    from libjxl_tpu.frame.frame_header import YCbCrChromaSubsampling
    cs = YCbCrChromaSubsampling(channel_mode=list(modes))
    chans = []
    for c, plane in enumerate([cb, y, cr]):
        hs, vs = cs.hshift(c), cs.vshift(c)
        p = plane
        if hs or vs:
            ph = -(-h // (1 << vs)) * (1 << vs)
            pw = -(-w // (1 << hs)) * (1 << hs)
            p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            p = p.reshape(ph >> vs, 1 << vs, pw >> hs, 1 << hs) \
                .mean(axis=(1, 3))
        chans.append(np.round(p * 255.0).astype(np.int32))
    wtr = BitWriter()
    write_codestream_headers(meta, wtr)
    encode_modular_frame(chans, meta, wtr, ycbcr_subsampling=list(modes))
    wtr.align_to_byte()
    return wtr.get_bytes()


def _img(h=48, w=64):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(128 + 90 * np.sin(x / 13)),
                     (128 + 70 * np.cos(y / 11)),
                     (120 + 60 * np.sin((x + y) / 17))],
                    -1).clip(0, 255).astype(np.uint8)


def test_ycbcr_444_roundtrip():
    img = _img()
    res = decode(_encode_ycbcr(img, [0, 0, 0]))
    err = np.abs(res.pixels.astype(int) - img.astype(int)).mean()
    assert err < 1.5, err  # YCbCr int rounding only


def test_ycbcr_420_roundtrip():
    img = _img()
    res = decode(_encode_ycbcr(img, [0, 1, 0]))
    assert res.pixels.shape == img.shape
    err = np.abs(res.pixels.astype(int) - img.astype(int)).mean()
    assert err < 4.0, err  # subsampled chroma


def test_ycbcr_422_roundtrip():
    img = _img(40, 56)
    res = decode(_encode_ycbcr(img, [0, 2, 0]))
    err = np.abs(res.pixels.astype(int) - img.astype(int)).mean()
    assert err < 3.0, err


def test_rgb_ycbcr_inverse():
    rng = np.random.default_rng(0)
    rgb = rng.random((3, 9, 11))
    cb, y, cr = rgb_to_ycbcr(rgb[0], rgb[1], rgb[2])
    back = ycbcr_to_rgb(cb, y, cr)
    np.testing.assert_allclose(back, rgb, atol=1e-12)
