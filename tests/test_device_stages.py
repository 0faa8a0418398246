"""Device render-pipeline post-stages: upsampling + noise synthesis.

decode(data, device=True) must reproduce the host decode bit-for-bit
(within float tolerance) for feature-bearing frames: 2x/4x upsampled
streams and noise-synthesis streams now run as jitted stages after EPF
(VERDICT item 5; dec_cache.cc stage order EPF -> upsampling -> noise).
"""

import numpy as np
import pytest

from libjxl_tpu.api.simple import decode, encode


def _img(h=96, w=112, seed=3):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    chans = [np.clip(0.5 + 0.3 * np.sin(x / 13 + c) * np.cos(y / 19)
                     + rng.normal(0, 0.02, (h, w)), 0, 1)
             for c in range(3)]
    return (np.stack(chans, axis=-1) * 255).astype(np.uint8)


@pytest.mark.parametrize("resampling", [2, 4])
def test_device_upsampling_matches_host(resampling):
    img = _img()
    data = encode(img, distance=1.0, effort=5, resampling=resampling)
    host = decode(data).pixels.astype(np.int32)
    dev = decode(data, device=True).pixels.astype(np.int32)
    assert host.shape == dev.shape
    assert np.abs(host - dev).max() <= 1


def test_device_noise_matches_host():
    img = _img(128, 128, seed=7)
    data = encode(img, distance=1.0, effort=5, noise=2.0)
    host = decode(data).pixels.astype(np.int32)
    dev = decode(data, device=True).pixels.astype(np.int32)
    assert np.abs(host - dev).max() <= 1


def test_device_noise_plus_upsampling():
    img = _img(80, 80, seed=9)
    data = encode(img, distance=1.5, effort=5, resampling=2, noise=1.5)
    host = decode(data).pixels.astype(np.int32)
    dev = decode(data, device=True).pixels.astype(np.int32)
    assert host.shape == dev.shape
    assert np.abs(host - dev).max() <= 1
