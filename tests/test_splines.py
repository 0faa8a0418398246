"""Splines: decode/encode/render (reference: splines.cc, spline_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.api import decode
from libjxl_tpu.api.simple import CodecMetadata
from libjxl_tpu.bitstream.bit_io import BitWriter
from libjxl_tpu.color.xyb import linear_rgb_to_xyb, srgb_to_linear
from libjxl_tpu.frame.encode_frame import encode_vardct_frame
from libjxl_tpu.frame.headers import BitDepth, write_codestream_headers
from libjxl_tpu.frame.splines import (
    Splines, _catmull_rom, _continuous_idct, _equally_spaced, quantize_spline,
)


def _encode_with_splines(base, s):
    h, w = base.shape[:2]
    meta = CodecMetadata()
    meta.size.set(w, h)
    meta.m.bit_depth = BitDepth.uint(8)
    meta.m.xyb_encoded = True
    wtr = BitWriter()
    write_codestream_headers(meta, wtr)
    srgb = base.astype(np.float32) / 255.0
    xyb = linear_rgb_to_xyb(srgb_to_linear(srgb).transpose(2, 0, 1))
    encode_vardct_frame(xyb, meta, wtr, distance=1.0, splines=s)
    wtr.align_to_byte()
    return wtr.get_bytes()


def test_spline_roundtrip_renders_stroke():
    base = np.full((96, 128, 3), 100, np.uint8)
    cps = [(10.0, 20.0), (60.0, 10.0), (100.0, 60.0), (120.0, 80.0)]
    color_dct = np.zeros((3, 32))
    color_dct[1, 0] = 0.5
    sigma_dct = np.zeros(32)
    sigma_dct[0] = 2.0
    qs = quantize_spline(cps, color_dct, sigma_dct, 0, 0.0, 1.0)
    s = Splines(splines=[qs], starting_points=[cps[0]])
    res = decode(_encode_with_splines(base, s))
    # Stroke raises R/G along the path; background stays at base level.
    rg = res.pixels[:, :, :2].astype(int)
    assert rg.max() > 100 + 15, rg.max()
    assert abs(rg[70:90, 5:25].mean() - 100) < 3


def test_spline_single_point():
    base = np.full((48, 48, 3), 80, np.uint8)
    color_dct = np.zeros((3, 32))
    color_dct[1, 0] = 0.6
    sigma_dct = np.zeros(32)
    sigma_dct[0] = 3.0
    qs = quantize_spline([(24.0, 24.0)], color_dct, sigma_dct, 1, 0.0, 1.0)
    s = Splines(quantization_adjustment=1, splines=[qs],
                starting_points=[(24.0, 24.0)])
    res = decode(_encode_with_splines(base, s))
    # Y-only stroke: R/G rise at the centre, corners untouched.
    centre = res.pixels[24, 24, :2].astype(int).mean()
    corner = res.pixels[5, 5, :2].astype(int).mean()
    assert centre > corner + 8, (centre, corner)


def test_continuous_idct_constant():
    dct = np.zeros(32)
    dct[0] = 0.75 * np.sqrt(2.0)  # pre-scaled like Dequantize's dct[0]
    for t in (0.0, 7.3, 31.0):
        assert abs(_continuous_idct(dct, t) - 1.5) < 1e-6


def test_catmull_rom_endpoints_and_density():
    pts = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    dense = _catmull_rom(pts)
    assert dense[0] == pts[0] and dense[-1] == pts[-1]
    assert len(dense) == (len(pts) - 1) * 16 + 1


def test_equally_spaced_unit_steps():
    pts = [(0.0, 0.0), (5.0, 0.0)]
    out = _equally_spaced(pts)
    xs = [p[0] for p, _ in out]
    # Unit spacing except the final residual point (multiplier < 1).
    assert xs[:-1] == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    assert out[-1][1] < 1.0
