"""Metric sanity tests (mirrors ssimulacra2 expectations)."""

import numpy as np

from libjxl_tpu.metrics import max_abs_error, psnr, ssimulacra2


def _img():
    y, x = np.mgrid[0:128, 0:128]
    return np.stack([(128 + 100 * np.sin(x / 19) * np.cos(y / 23)),
                     (128 + 90 * np.cos(x / 13)),
                     (120 + 80 * np.sin((x + y) / 17))],
                    -1).clip(0, 255).astype(np.uint8)


def test_psnr_basics():
    img = _img()
    assert psnr(img, img) == float("inf")
    noisy = np.clip(img.astype(int) + 5, 0, 255).astype(np.uint8)
    p = psnr(img, noisy)
    assert 30 < p < 40
    assert max_abs_error(img, noisy) == 5


def test_ssimulacra2_ordering():
    rng = np.random.default_rng(0)
    img = _img()
    assert ssimulacra2(img, img) == 100.0
    slight = np.clip(img.astype(int) + rng.integers(-2, 3, img.shape),
                     0, 255).astype(np.uint8)
    heavy = np.clip(img.astype(int) + rng.integers(-40, 41, img.shape),
                    0, 255).astype(np.uint8)
    s1 = ssimulacra2(img, slight)
    s2 = ssimulacra2(img, heavy)
    assert s1 > 85
    assert s2 < 40
    assert s1 > s2


def test_ssimulacra2_tracks_codec_distance():
    from libjxl_tpu.api import decode, encode
    img = _img()
    scores = [ssimulacra2(img, decode(encode(img, distance=d)).pixels)
              for d in (0.5, 2.0, 6.0)]
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] > 85
