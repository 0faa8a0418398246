"""AFV transform family (reference: dec_transforms-inl.h AFV*)."""

import numpy as np
import pytest

import libjxl_tpu.frame.acs_select as acs_select
from libjxl_tpu.api import decode, encode
from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct.afv_data import AFV_BASIS
from libjxl_tpu.vardct.reconstruct import (
    transform_from_pixels, transform_to_pixels,
)


def test_basis_orthonormal():
    assert np.abs(AFV_BASIS @ AFV_BASIS.T - np.eye(16)).max() < 1e-12


@pytest.mark.parametrize("s", [acs.AFV0, acs.AFV1, acs.AFV2, acs.AFV3])
def test_afv_transform_roundtrip(s):
    rng = np.random.default_rng(s)
    px = rng.normal(size=(8, 8))
    back = transform_to_pixels(s, transform_from_pixels(s, px))
    assert np.abs(back - px).max() < 1e-10


def test_afv_dc_consistency():
    # A constant block must produce only butterflied-DC coefficients.
    px = np.full((8, 8), 3.0)
    co = transform_from_pixels(acs.AFV0, px).reshape(8, 8)
    nz = np.abs(co) > 1e-9
    assert nz[0, 0] and nz.sum() <= 3


@pytest.mark.parametrize("forced", [acs.AFV0, acs.AFV3, acs.IDENTITY,
                                    acs.DCT4X4])
def test_end_to_end_with_forced_strategy(forced, monkeypatch):
    def fake_select(planes, raw_quant, quantizer, **kw):
        by, bx = raw_quant.shape
        out = np.zeros((by, bx), np.int32)
        out[::2, ::2] = forced
        return out

    monkeypatch.setattr(acs_select, "select_strategies", fake_select)
    y, x = np.mgrid[0:64, 0:80]
    img = np.stack([(128 + 90 * np.sin(x / 13)), (128 + 70 * np.cos(y / 11)),
                    (120 + 60 * np.sin((x + y) / 17))],
                   -1).clip(0, 255).astype(np.uint8)
    res = decode(encode(img, distance=1.0))
    err = np.abs(res.pixels.astype(int) - img.astype(int)).mean()
    assert err < 4.0, (forced, err)
