"""Custom quant-matrix serialization (reference: quant_weights.cc
Decode/Encode, quant_weights_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct.quant_weights import (
    MODE_DCT, MODE_DCT2, MODE_ID, MODE_LIBRARY, MODE_RAW, DequantMatrices,
    QuantEncoding,
)


def _roundtrip(dm):
    w = BitWriter()
    dm.encode(w)
    w.align_to_byte()
    dm2 = DequantMatrices()
    dm2.decode(BitReader(w.get_bytes()))
    return dm2


def test_all_default_roundtrip():
    dm = _roundtrip(DequantMatrices())
    assert all(e.mode == MODE_LIBRARY for e in dm.encodings)


def test_raw_jpeg_style_table():
    rng = np.random.default_rng(0)
    q = rng.integers(1, 100, (3, 64))
    dm = DequantMatrices()
    dm.encodings[0] = QuantEncoding(MODE_RAW, qraw_table=q,
                                    qraw_den=1 / 64.0)
    dm2 = _roundtrip(dm)
    assert dm2.encodings[0].mode == MODE_RAW
    np.testing.assert_array_equal(dm2.encodings[0].qraw_table, q)
    assert dm2.encodings[0].qraw_den == pytest.approx(1 / 64.0, rel=1e-3)
    # Dequant step = den * q (JPEG semantics).
    t = dm2.table(acs.DCT8X8)
    np.testing.assert_allclose(t, q.reshape(3, 8, 8) / 64.0, rtol=1e-5)


def test_custom_dct_bands():
    dm = DequantMatrices()
    dm.encodings[4] = QuantEncoding(
        MODE_DCT, dct_params=[[3000.0, 0.0, -0.5], [900.0, -0.1, -0.2],
                              [100.0, -0.3, -0.25]])
    dm2 = _roundtrip(dm)
    t_custom = dm2.table(acs.DCT16X16)
    t_default = DequantMatrices().table(acs.DCT16X16)
    assert np.isfinite(t_custom).all()
    assert not np.allclose(t_custom, t_default)
    # Other tables still match the library.
    np.testing.assert_allclose(dm2.table(acs.DCT8X8),
                               DequantMatrices().table(acs.DCT8X8))


def test_custom_id_and_dct2():
    dm = DequantMatrices()
    dm.encodings[1] = QuantEncoding(
        MODE_ID, idweights=[[300.0, 200.0, 100.0]] * 3)
    dm.encodings[2] = QuantEncoding(
        MODE_DCT2, dct2weights=[[3800.0, 2500.0, 1600.0, 1000.0, 600.0,
                                 400.0]] * 3)
    dm2 = _roundtrip(dm)
    assert dm2.encodings[1].idweights[0][0] == pytest.approx(300.0, rel=1e-2)
    assert dm2.encodings[2].dct2weights[1][5] == pytest.approx(400.0,
                                                               rel=1e-2)


def test_raw_table_big_strategy():
    rng = np.random.default_rng(1)
    q = rng.integers(1, 256, (3, 16 * 16 * 64))
    dm = DequantMatrices()
    dm.encodings[13] = QuantEncoding(MODE_RAW, qraw_table=q, qraw_den=0.5)
    dm2 = _roundtrip(dm)
    np.testing.assert_array_equal(dm2.encodings[13].qraw_table, q)
