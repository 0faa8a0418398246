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


def test_recursive_gaussian_matches_reference_recurrence():
    """_fast_gaussian_1d == the scalar FastGaussian1D recurrence
    (tools/gauss_blur.cc:46) on a random signal, exactly."""
    from libjxl_tpu.metrics.ssimulacra2 import _RG, _fast_gaussian_1d
    n_r, n2, d1 = _RG
    assert n_r == 5  # round(3.2795 * 1.5 + 0.2546), gauss_blur.cc:437
    rng = np.random.default_rng(0)
    sig = rng.random(50).astype(np.float32)
    xsize = sig.size
    ref = np.zeros(xsize, np.float32)
    prev = np.zeros(3, np.float32)
    prev2 = np.zeros(3, np.float32)
    for n in range(-n_r + 1, xsize):
        left, right = n - n_r - 1, n + n_r - 1
        lv = sig[left] if left >= 0 else np.float32(0)
        rv = sig[right] if right < xsize else np.float32(0)
        y = n2 * (lv + rv) - d1 * prev - prev2
        prev2, prev = prev, y
        if n >= 0:
            ref[n] = y.sum()
    got = _fast_gaussian_1d(sig[None, :])[0]
    np.testing.assert_array_equal(got, ref)


def test_recursive_gaussian_impulse_response():
    """Three-pole IIR approximates a sigma-1.5 Gaussian: unit DC gain,
    max pointwise deviation < 2e-3 (it is an approximation by design —
    matching it, not a true Gaussian, is what score parity needs)."""
    from libjxl_tpu.metrics.ssimulacra2 import _fast_gaussian_1d
    imp = np.zeros(101, np.float32)
    imp[50] = 1
    resp = _fast_gaussian_1d(imp[None, :])[0]
    xs = np.arange(101) - 50
    gauss = np.exp(-0.5 * (xs / 1.5) ** 2)
    gauss /= gauss.sum()
    assert abs(resp.sum() - 1.0) < 1e-5
    assert np.abs(resp - gauss).max() < 2e-3


def test_ssimulacra2_pinned_value():
    """Fixed synthetic pair pins the full metric (constants, blur,
    promotion pattern); drift means a behavior change."""
    y, x = np.mgrid[0:96, 0:80]
    a = np.stack([(128 + 100 * np.sin(x / 7)).clip(0, 255),
                  (128 + 90 * np.cos(y / 5)).clip(0, 255),
                  (120 + 80 * np.sin((x + y) / 11)).clip(0, 255)],
                 -1).astype(np.uint8)
    b = np.clip(a.astype(int)
                + ((x[..., None] + y[..., None]) % 5 - 2),
                0, 255).astype(np.uint8)
    assert abs(ssimulacra2(a, b) - 96.46293109504593) < 1e-9
