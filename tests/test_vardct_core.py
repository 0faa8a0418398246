"""VarDCT core tests (mirrors dct_test.cc, ac_strategy_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct.dct import (
    dct2d, dct_matrix, idct2d, idct_matrix, llf_from_dc, dc_from_llf,
    resample_scales,
)
from libjxl_tpu.vardct.quant_weights import DequantMatrices
from libjxl_tpu.vardct.quantizer import Quantizer, adjust_quant_bias
from libjxl_tpu.vardct.reconstruct import (
    transform_from_pixels, transform_to_pixels,
)

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("n", [2, 4, 8, 16, 32, 64, 128, 256])
def test_dct_idct_identity(n):
    np.testing.assert_allclose(idct_matrix(n) @ dct_matrix(n), np.eye(n),
                               atol=1e-12)


def test_dct_dc_is_mean():
    block = RNG.normal(size=(8, 8))
    coef = dct2d(block)
    assert abs(coef[0, 0] - block.mean()) < 1e-12


def test_dct2d_roundtrip_rect():
    for h, w in [(8, 8), (8, 16), (16, 8), (32, 8), (16, 32)]:
        block = RNG.normal(size=(h, w))
        np.testing.assert_allclose(idct2d(dct2d(block)), block, atol=1e-10)


def test_resample_scales_match_reference():
    # resample_scales(n, m) with n < m is the UPsampling direction used
    # by LowestFrequenciesFromDC: DCTResampleScales<n, m>
    # (dct_scales.h <2,16> and <4,32>).
    np.testing.assert_allclose(resample_scales(2, 16),
                               [1.0, 1.108937353592731823], rtol=1e-12)
    np.testing.assert_allclose(
        resample_scales(4, 32),
        [1.0, 1.025760096781116015, 1.108937353592731823,
         1.270559368765487251], rtol=1e-7)
    # Downsampling direction <16, 2> (encoder DCFromLowestFrequencies).
    np.testing.assert_allclose(resample_scales(16, 2)[1],
                               0.901764195028874394, rtol=1e-12)


def test_llf_dc_roundtrip():
    for cy, cx in [(2, 2), (1, 2), (4, 2), (4, 4)]:
        dc = RNG.normal(size=(cy, cx))
        llf = llf_from_dc(dc, cy * 8, cx * 8)
        back = dc_from_llf(llf, cy * 8, cx * 8)
        np.testing.assert_allclose(back, dc, atol=1e-10)


# All strategies currently implemented (AFV pending).
IMPLEMENTED = [s for s in range(acs.NUM_STRATEGIES)
               if s not in (acs.AFV0, acs.AFV1, acs.AFV2, acs.AFV3)]


@pytest.mark.parametrize("strategy", IMPLEMENTED)
def test_transform_roundtrip(strategy):
    cx, cy = acs.covered_blocks(strategy)
    pixels = RNG.normal(size=(cy * 8, cx * 8))
    coeffs = transform_from_pixels(strategy, pixels)
    back = transform_to_pixels(strategy, coeffs)
    np.testing.assert_allclose(back, pixels, atol=1e-8)


@pytest.mark.parametrize("strategy", IMPLEMENTED)
def test_natural_order_is_permutation(strategy):
    order = acs.natural_coeff_order(strategy)
    cx, cy = acs.covered_blocks(strategy)
    size = cx * cy * 64
    assert len(order) == size
    assert sorted(order) == list(range(size))
    # LLF prefix covers the top-left cy x cx corner of the layout.
    ly, lx = acs.coefficient_layout(cy, cx)
    llf_positions = sorted(int(y * lx * 8 + x)
                           for y in range(ly) for x in range(lx))
    assert sorted(order[:cx * cy]) == llf_positions


def test_zigzag_8x8_starts_as_jpeg():
    order = acs.natural_coeff_order(acs.DCT8X8)
    # First few entries of the classic zig-zag.
    assert list(order[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_quant_tables_compute():
    dm = DequantMatrices()
    for s in range(acs.NUM_STRATEGIES):
        t = dm.table(s)
        cx, cy = acs.covered_blocks(s)
        ly, lx = acs.coefficient_layout(cy, cx)
        assert t.shape == (3, ly * 8, lx * 8), s
        assert np.all(np.isfinite(t))
        assert np.all(t > 0)
    # DCT8 y-channel DC band seed: weight 560 -> dequant 1/560.
    t8 = dm.table(acs.DCT8X8)
    np.testing.assert_allclose(t8[1, 0, 0], 1.0 / 560.0, rtol=1e-5)


def test_adjust_quant_bias():
    q = np.array([[[0, 1, -1, 2]], [[0, 1, -1, 5]], [[0, 1, -1, -3]]])
    out = adjust_quant_bias(q)
    assert out[0, 0, 0] == 0
    np.testing.assert_allclose(out[0, 0, 1], 1 - 0.05465007330715401)
    np.testing.assert_allclose(out[1, 0, 2], -(1 - 0.07005449891748593))
    np.testing.assert_allclose(out[0, 0, 3], 2 - 0.145 / 2)
    np.testing.assert_allclose(out[2, 0, 3], -3 + 0.145 / -3 * -1, rtol=1e-6)


def test_quantizer_roundtrip():
    from libjxl_tpu.bitstream import BitReader, BitWriter

    dm = DequantMatrices()
    q = Quantizer(dm, quant_dc=42, global_scale=12345)
    w = BitWriter()
    q.encode(w)
    w.align_to_byte()
    q2 = Quantizer(dm)
    q2.decode(BitReader(w.get_bytes()))
    assert (q2.global_scale, q2.quant_dc) == (12345, 42)
