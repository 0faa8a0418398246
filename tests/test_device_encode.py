"""Device (TPU) encoder parity tests.

`encode(img, device=True)` routes the VarDCT compute stage (XYB forward
masking field, ACS search, forward DCTs, CfL fit, quantization —
reference hot loops /root/reference/lib/jxl/enc_group.cc:380,
enc_adaptive_quantization.cc:929, enc_ac_strategy.cc:827) through the
jitted pipeline in ops/encode_pipeline.py. These tests check the device
path against the host encoder: identical bitstreams when the float32
numerics agree, and decode parity always.
"""

import numpy as np
import pytest

from libjxl_tpu.api.simple import decode, encode


def _test_image(h=128, w=144, seed=3):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    chans = []
    for c in range(3):
        base = (0.45 + 0.3 * np.sin(x / (11 + 5 * c)) * np.cos(y / (17 - 3 * c))
                + 0.1 * np.sin((x + 2 * y) / 29)
                + rng.normal(0, 0.02, (h, w)))
        chans.append(np.clip(base, 0, 1))
    return (np.stack(chans, axis=-1) * 255).astype(np.uint8)


@pytest.mark.parametrize("effort,distance", [(3, 2.0), (5, 1.0), (7, 1.0)])
def test_device_encode_matches_host(effort, distance):
    img = _test_image()
    host = encode(img, distance=distance, effort=effort)
    dev = encode(img, distance=distance, effort=effort, device=True)
    # float32 device numerics can differ from the host's float64 mix in
    # rare +-1 quantization decisions; sizes must agree within 1% and
    # decodes must be near-identical.
    assert abs(len(dev) - len(host)) <= max(8, 0.01 * len(host)), \
        (len(host), len(dev))
    ph = decode(host).pixels.astype(np.int32)
    pd = decode(dev).pixels.astype(np.int32)
    assert np.abs(ph - pd).max() <= 2


@pytest.mark.parametrize("effort", [5, 7])
def test_device_encode_byte_identical_e5_plus(effort):
    """Sub-8x8 ACS flips (host-side in the device flow) must restore
    exact byte parity at e5+ on the CPU backend (deterministic)."""
    img = _test_image()
    host = encode(img, distance=1.0, effort=effort)
    dev = encode(img, distance=1.0, effort=effort, device=True)
    assert host == dev, (len(host), len(dev))


def test_device_encode_decodes_correctly():
    img = _test_image(96, 96, seed=9)
    data = encode(img, distance=1.0, effort=5, device=True)
    out = decode(data).pixels.astype(np.float64)
    err = np.abs(out - img.astype(np.float64)).mean()
    assert err < 5.0, err


def test_device_encode_odd_size():
    img = _test_image(101, 67, seed=11)
    host = encode(img, distance=1.5, effort=5)
    dev = encode(img, distance=1.5, effort=5, device=True)
    ph = decode(host).pixels.astype(np.int32)
    pd = decode(dev).pixels.astype(np.int32)
    assert np.abs(ph - pd).max() <= 2


def test_device_encode_low_effort():
    img = _test_image(80, 80, seed=13)
    dev = encode(img, distance=2.0, effort=2, device=True)
    out = decode(dev).pixels.astype(np.float64)
    assert np.abs(out - img.astype(np.float64)).mean() < 6.0
