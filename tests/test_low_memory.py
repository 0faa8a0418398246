"""Low-memory row-streaming decode (low_memory_render_pipeline.h
analogue): per-band output must match the one-shot decoder bit-exactly,
including loop filters across band halos; unsupported profiles raise
NotSupported for the caller to fall back."""

import numpy as np
import pytest

from libjxl_tpu.api.simple import decode, encode
from libjxl_tpu.frame.incremental import NotSupported
from libjxl_tpu.frame.low_memory import decode_low_memory


def _img(h, w, seed=5):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    chans = [np.clip(0.5 + 0.3 * np.sin(x / 17 + c) * np.cos(y / 23)
                     + rng.normal(0, 0.02, (h, w)), 0, 1)
             for c in range(3)]
    return (np.stack(chans, axis=-1) * 255).astype(np.uint8)


def _assemble(data, shape):
    out = np.zeros(shape, np.uint8)
    got = []

    def cb(y0, rows):
        got.append((y0, rows.shape[0]))
        out[y0:y0 + rows.shape[0]] = rows

    h, w = decode_low_memory(data, cb)
    assert (h, w) == shape[:2]
    # Bands arrive in order and cover every row exactly once.
    covered = 0
    for y0, bh in got:
        assert y0 == covered
        covered += bh
    assert covered == h
    return out


@pytest.mark.parametrize("epf", [-1, 0, 3])
def test_low_memory_matches_oneshot(epf):
    img = _img(700, 530)
    data = encode(img, distance=1.0, effort=5, epf=epf)
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)


def test_low_memory_ragged_multicolumn():
    img = _img(333, 777, seed=9)
    data = encode(img, distance=2.0, effort=4)
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)


def test_low_memory_rejects_modular():
    img = _img(96, 96)
    with pytest.raises(NotSupported):
        decode_low_memory(encode(img, lossless=True),
                          lambda y0, rows: None)


def test_low_memory_progressive():
    """Multi-pass streams accumulate every pass per band."""
    img = _img(600, 300, seed=3)
    data = encode(img, distance=1.5, progressive=True)
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)


def test_low_memory_noise():
    """Noise synthesis runs band-wise off real-neighbor noise rows."""
    img = _img(520, 340, seed=4)
    data = encode(img, distance=1.0, noise=3200.0)
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)


def test_low_memory_upsampling():
    """Learned 2x upsampling streams with a 2-row filtered halo."""
    img = _img(360, 260, seed=6)
    data = encode(img, distance=1.0, resampling=2)
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)


def test_low_memory_progressive_epf_noise_combo():
    img = _img(560, 280, seed=7)
    data = encode(img, distance=2.0, progressive=True, epf=2,
                  noise=1600.0)
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)


def test_low_memory_small_single_section():
    # Single-TOC-entry frames (small images) share one sequential
    # reader across sections.
    img = _img(64, 80, seed=2)
    data = encode(img, distance=1.0)
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)


def _spline_stream(h=600, w=280):
    from libjxl_tpu.bitstream.bit_io import BitWriter
    from libjxl_tpu.color.xyb import linear_rgb_to_xyb, srgb_to_linear
    from libjxl_tpu.frame.encode_frame import encode_vardct_frame
    from libjxl_tpu.frame.headers import (BitDepth, CodecMetadata,
                                          write_codestream_headers)
    from libjxl_tpu.frame.splines import Splines, quantize_spline

    base = _img(h, w, seed=8)
    meta = CodecMetadata()
    meta.size.set(w, h)
    meta.m.bit_depth = BitDepth.uint(8)
    meta.m.xyb_encoded = True
    wtr = BitWriter()
    write_codestream_headers(meta, wtr)
    srgb = base.astype(np.float32) / 255.0
    xyb = linear_rgb_to_xyb(srgb_to_linear(srgb).transpose(2, 0, 1))
    cps = [(10.0, 20.0), (120.0, 300.0), (200.0, 560.0)]
    color_dct = np.zeros((3, 32))
    color_dct[1, 0] = 0.5
    sigma_dct = np.zeros(32)
    sigma_dct[0] = 2.0
    qs = quantize_spline(cps, color_dct, sigma_dct, 0, 0.0, 1.0)
    s = Splines(splines=[qs], starting_points=[cps[0]])
    encode_vardct_frame(xyb, meta, wtr, distance=1.0, splines=s)
    wtr.align_to_byte()
    return wtr.get_bytes()


def test_low_memory_splines():
    """Spline strokes spanning several bands render windowed."""
    data = _spline_stream()
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)


def test_low_memory_patches():
    """Reference frame decodes one-shot; the visible frame streams with
    band-windowed patch blits."""
    from libjxl_tpu.bitstream.bit_io import BitWriter
    from libjxl_tpu.color.xyb import linear_rgb_to_xyb, srgb_to_linear
    from libjxl_tpu.frame.encode_frame import encode_vardct_frame
    from libjxl_tpu.frame.headers import (BitDepth, CodecMetadata,
                                          write_codestream_headers)
    from libjxl_tpu.frame.patches import (PatchBlendMode, PatchBlending,
                                          PatchDictionary, PatchPosition,
                                          PatchRefPosition)

    h, w = 600, 280
    base = _img(h, w, seed=10)
    ref_img = _img(64, 64, seed=11)
    meta = CodecMetadata()
    meta.size.set(w, h)
    meta.m.bit_depth = BitDepth.uint(8)
    meta.m.xyb_encoded = True
    wtr = BitWriter()
    write_codestream_headers(meta, wtr)

    def to_xyb(img):
        srgb = img.astype(np.float32) / 255.0
        return linear_rgb_to_xyb(srgb_to_linear(srgb).transpose(2, 0, 1))

    pd = PatchDictionary(
        ref_positions=[PatchRefPosition(ref=1, x0=4, y0=4,
                                        xsize=40, ysize=40)],
        positions=[PatchPosition(x=30, y=230, ref_idx=0),
                   PatchPosition(x=100, y=500, ref_idx=0)],
        blendings=[[PatchBlending(mode=PatchBlendMode.REPLACE)],
                   [PatchBlending(mode=PatchBlendMode.ADD)]])
    encode_vardct_frame(to_xyb(ref_img), meta, wtr, distance=1.0,
                        save_as_reference=1)
    encode_vardct_frame(to_xyb(base), meta, wtr, distance=1.0, patches=pd)
    wtr.align_to_byte()
    data = wtr.get_bytes()
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)
