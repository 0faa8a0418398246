"""Native C++ runtime vs pure-Python differential tests."""

import os

import numpy as np
import pytest

from libjxl_tpu.native.bindings import available


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_native_python_decode_identical():
    from libjxl_tpu.api import decode, encode
    import libjxl_tpu.native.bindings as b

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)
    data = encode(img, lossless=True)
    y, x = np.mgrid[0:70, 0:90]
    img2 = np.stack([x % 256, (x + y) % 256, y % 256], -1).astype(np.uint8)
    data2 = encode(img2, distance=1.0)

    native = [decode(data).pixels, decode(data2).pixels]
    os.environ["LIBJXL_TPU_NO_NATIVE"] = "1"
    b._lib, b._tried = None, False
    try:
        python = [decode(data).pixels, decode(data2).pixels]
    finally:
        del os.environ["LIBJXL_TPU_NO_NATIVE"]
        b._lib, b._tried = None, False
    np.testing.assert_array_equal(native[0], python[0])
    # Lossy path: the fused native XYB->sRGB tail (LUT-lerp OETF in
    # float32) may land a rounding one code value away from the float64
    # numpy chain on exact .5 boundaries; the entropy/pixel decode
    # itself is identical (the lossless image above is bit-equal).
    diff = np.abs(native[1].astype(int) - python[1].astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_native_python_encode_identical():
    from libjxl_tpu.api import encode
    import libjxl_tpu.native.bindings as b

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (40, 55, 3), dtype=np.uint8)
    data_native = encode(img, lossless=True)
    lossy_native = encode(img, distance=2.0)
    os.environ["LIBJXL_TPU_NO_NATIVE"] = "1"
    b._lib, b._tried = None, False
    try:
        data_python = encode(img, lossless=True)
        lossy_python = encode(img, distance=2.0)
    finally:
        del os.environ["LIBJXL_TPU_NO_NATIVE"]
        b._lib, b._tried = None, False
    assert data_native == data_python
    assert lossy_native == lossy_python


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_native_loop_filters_match_numpy():
    """host_gaborish / host_epf (C++) vs the numpy reference filters."""
    from libjxl_tpu.pipeline import loop_filters as LF

    class Cfg:
        gab = True
        gab_x_weight1 = 0.115169525
        gab_x_weight2 = 0.061248592
        gab_y_weight1 = 0.115169525
        gab_y_weight2 = 0.061248592
        gab_b_weight1 = 0.115169525
        gab_b_weight2 = 0.061248592
        epf_iters = 3
        epf_sharp_lut = (0.0, 1 / 7, 2 / 7, 3 / 7, 4 / 7, 5 / 7,
                         6 / 7, 1.0)
        epf_quant_mul = 0.46
        epf_pass0_sigma_scale = 0.9
        epf_pass2_sigma_scale = 6.5
        epf_border_sad_mul = 2.0 / 3
        epf_channel_scale = (40.0, 5.0, 3.5)

    rng = np.random.default_rng(3)
    img = rng.normal(0, 1, (3, 75, 93)).astype(np.float32)
    isb = (-1.0 / np.abs(rng.normal(1, 0.3, (10, 12)))).astype(np.float32)
    isb[0, 0] = -100.0   # a skipped block (inv_sigma < MIN_SIGMA)

    a = LF.gaborish(img, Cfg)
    b = LF.gaborish_native(img, Cfg)
    assert b is not None
    np.testing.assert_allclose(a, b, atol=2e-6)

    for iters in (1, 2, 3):
        Cfg.epf_iters = iters
        ref = img
        if iters >= 3:
            ref = LF.epf0(ref, Cfg, isb)
        if iters >= 1:
            ref = LF.epf1(ref, Cfg, isb)
        if iters >= 2:
            ref = LF.epf2(ref, Cfg, isb)
        got = LF.epf_native(img, Cfg, isb)
        assert got is not None
        np.testing.assert_allclose(ref, got, atol=3e-6, rtol=1e-5)


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_native_xyb_srgb_px_matches_numpy():
    from libjxl_tpu.color.xyb import (linear_to_srgb, xyb_to_linear_rgb,
                                      xyb_to_srgb_px_native)

    rng = np.random.default_rng(11)
    xyb = np.stack([rng.normal(0, 0.02, (37, 53)),
                    rng.uniform(0, 0.8, (37, 53)),
                    rng.uniform(0, 0.8, (37, 53))]).astype(np.float32)
    ref = np.clip(np.round(
        linear_to_srgb(xyb_to_linear_rgb(xyb)) * 255), 0, 255) \
        .astype(np.uint8).transpose(1, 2, 0)
    got = xyb_to_srgb_px_native(xyb, 255, np.uint8)
    assert got is not None
    # LUT-lerp sRGB encode can land a rounding one code value away on
    # exact .5 boundaries; everything else is identical.
    diff = np.abs(ref.astype(int) - got.astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01
