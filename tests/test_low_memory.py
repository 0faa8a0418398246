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


def test_low_memory_rejects_features():
    img = _img(96, 96)
    with pytest.raises(NotSupported):
        decode_low_memory(encode(img, distance=1.0, noise=1.0),
                          lambda y0, rows: None)
    with pytest.raises(NotSupported):
        decode_low_memory(encode(img, distance=1.0, progressive=True),
                          lambda y0, rows: None)
    with pytest.raises(NotSupported):
        decode_low_memory(encode(img, lossless=True),
                          lambda y0, rows: None)


def test_low_memory_small_single_section():
    # Single-TOC-entry frames (small images) share one sequential
    # reader across sections.
    img = _img(64, 80, seed=2)
    data = encode(img, distance=1.0)
    ref = decode(data).pixels
    out = _assemble(data, ref.shape)
    np.testing.assert_array_equal(out, ref)
