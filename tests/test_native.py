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
    np.testing.assert_array_equal(native[1], python[1])


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
