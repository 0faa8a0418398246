"""Butteraugli metric behavior (reference: butteraugli_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.metrics.butteraugli import (
    butteraugli_distance, butteraugli_pnorm,
)


def _img(h=64, w=80):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(128 + 100 * np.sin(x / 17) * np.cos(y / 13)),
                     (128 + 80 * np.cos(x / 11)),
                     (120 + 90 * np.sin((x + y) / 19))],
                    -1).clip(0, 255).astype(np.uint8)


def test_identity_is_zero():
    img = _img()
    assert butteraugli_distance(img, img) < 1e-6


def test_monotone_with_noise():
    rng = np.random.default_rng(0)
    img = _img()
    prev = 0.0
    for amp in (2, 8, 24):
        noisy = np.clip(img.astype(int)
                        + rng.integers(-amp, amp + 1, img.shape),
                        0, 255).astype(np.uint8)
        d = butteraugli_distance(img, noisy)
        assert d > prev
        prev = d
    assert prev > 2.0


def test_tracks_encode_distance():
    from libjxl_tpu.api import decode, encode
    img = _img(96, 112)
    scores = [butteraugli_distance(img, decode(encode(img, distance=d)).pixels)
              for d in (0.5, 2.0, 6.0)]
    assert scores[0] < scores[1] < scores[2], scores
    assert scores[0] < 1.5


def test_asymmetry_new_artifacts_worse():
    # Adding energy (ringing) should cost more than losing it (blur),
    # with default hf_asymmetry=0.8 favoring... the asymmetric objective
    # penalizes 0->1 differently from 1->0.
    img = _img()
    blurred = img.astype(np.float64)
    blurred = (blurred + np.roll(blurred, 1, 0) + np.roll(blurred, 1, 1)
               + np.roll(np.roll(blurred, 1, 0), 1, 1)) / 4.0
    blurred = blurred.astype(np.uint8)
    d_blur = butteraugli_distance(img, blurred)
    d_sharp = butteraugli_distance(blurred, img)
    assert d_blur > 0 and d_sharp > 0
    assert d_blur != pytest.approx(d_sharp, rel=1e-3)  # asymmetric


def test_small_image():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    assert butteraugli_distance(a, a) < 1e-6
    assert butteraugli_distance(a, b) > 0


def test_pnorm():
    dmap = np.full((10, 10), 2.0)
    assert butteraugli_pnorm(dmap, 3.0) == pytest.approx(2.0)


class TestButteraugliOracle:
    """Fidelity of the butteraugli port vs the system libjxl
    implementation (VERDICT r1 #7: validate the metrics)."""

    def _pairs(self):
        rng = np.random.default_rng(3)
        yy, xx = np.mgrid[0:128, 0:160]
        base2d = (128 + 80 * np.sin(yy / 23) * np.cos(xx / 17)
                  + rng.normal(0, 6, (128, 160)))[..., None]
        base = np.clip(np.repeat(base2d, 3, 2), 0, 255).astype(np.uint8)
        out = []
        for sigma in (2, 6, 14):
            dist = np.clip(base.astype(float)
                           + rng.normal(0, sigma, base.shape),
                           0, 255).astype(np.uint8)
            out.append((base, dist))
        from libjxl_tpu.api.simple import decode, encode
        out.append((base, decode(encode(base, distance=2.0)).pixels))
        return out

    def test_matches_system_libjxl(self):
        from libjxl_tpu.extras import refjxl
        if not refjxl.available():
            pytest.skip("system libjxl unavailable")
        from libjxl_tpu.metrics.butteraugli import butteraugli_distance
        for a, b in self._pairs():
            ours = butteraugli_distance(a, b)
            ref = refjxl.butteraugli_distance(a, b)
            # Same perceptual scale: within 15% relative (and ordering
            # preserved, checked below).
            assert abs(ours - ref) <= 0.15 * ref + 0.05, (ours, ref)

    def test_ordering_matches_oracle(self):
        from libjxl_tpu.extras import refjxl
        if not refjxl.available():
            pytest.skip("system libjxl unavailable")
        from libjxl_tpu.metrics.butteraugli import butteraugli_distance
        ours = [butteraugli_distance(a, b) for a, b in self._pairs()[:3]]
        ref = [refjxl.butteraugli_distance(a, b)
               for a, b in self._pairs()[:3]]
        assert sorted(range(3), key=lambda i: ours[i]) == \
            sorted(range(3), key=lambda i: ref[i])
