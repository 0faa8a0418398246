"""Multi-frame / animation roundtrips (reference: animation tests in
jxl_test.cc, blending.cc PerformBlending)."""

import numpy as np
import pytest

from libjxl_tpu.api import decode_all, encode, encode_animation
from libjxl_tpu.frame.blending import blend_frame
from libjxl_tpu.frame.frame_header import BlendMode


def _frames(n=4, h=40, w=50):
    y, x = np.mgrid[0:h, 0:w]
    return [np.stack([(x * 3 + t * 40) % 256, (y * 2 + t * 10) % 256,
                      (x + y + t * 5) % 256], -1).astype(np.uint8)
            for t in range(n)]


def test_lossless_animation_exact():
    frames = _frames()
    d = encode_animation(frames, lossless=True, durations=[1, 2, 3, 4],
                         tps=(24, 1))
    out, meta = decode_all(d)
    assert meta.m.have_animation
    assert meta.m.animation.tps_numerator == 24
    assert [o.duration for o in out] == [1, 2, 3, 4]
    for f, o in zip(frames, out):
        np.testing.assert_array_equal(o.pixels, f)


def test_lossy_animation():
    frames = _frames(3)
    out, _ = decode_all(encode_animation(frames, distance=1.0))
    for f, o in zip(frames, out):
        assert np.abs(o.pixels.astype(int) - f.astype(int)).mean() < 6


def test_decode_all_on_still():
    img = _frames(1)[0]
    out, meta = decode_all(encode(img, lossless=True))
    assert len(out) == 1 and not meta.m.have_animation
    np.testing.assert_array_equal(out[0].pixels, img)


def test_blend_modes_math():
    canvas = np.full((4, 4, 3), 0.5, np.float32)
    ca = np.full((4, 4), 1.0, np.float32)
    src = np.full((2, 2, 3), 1.0, np.float32)
    sa = np.full((2, 2), 0.5, np.float32)
    blend_frame(canvas, ca, src, sa, BlendMode.BLEND, 1, 1)
    # non-premultiplied over opaque 0.5: 0.5*1 + 0.5*0.5 = 0.75
    assert np.allclose(canvas[1:3, 1:3], 0.75)
    assert np.allclose(canvas[0, 0], 0.5)

    canvas2 = np.full((2, 2, 3), 0.25, np.float32)
    blend_frame(canvas2, None, np.full((2, 2, 3), 0.5, np.float32), None,
                BlendMode.ADD, 0, 0)
    assert np.allclose(canvas2, 0.75)
    blend_frame(canvas2, None, np.full((2, 2, 3), 0.5, np.float32), None,
                BlendMode.MUL, 0, 0)
    assert np.allclose(canvas2, 0.375)


def test_blend_out_of_bounds_clip():
    canvas = np.zeros((4, 4, 3), np.float32)
    src = np.ones((3, 3, 3), np.float32)
    blend_frame(canvas, None, src, None, BlendMode.REPLACE, -1, 3)
    assert canvas[3, 0, 0] == 1.0 and canvas[3, 2, 0] == 0.0


def test_decode_all_frames_match_oracle():
    """Every composed frame (REPLACE and alpha-BLEND chains) must match
    the system libjxl decoder's coalesced per-frame output."""
    import numpy as np
    import pytest
    from libjxl_tpu.api.simple import decode_all, encode_animation
    from libjxl_tpu.extras import refjxl
    if not refjxl.available():
        pytest.skip("system libjxl unavailable")
    rng = np.random.default_rng(21)
    frames = []
    for i in range(3):
        fr = np.zeros((56, 72, 4), np.uint8)
        fr[:, :, :3] = np.clip(rng.normal(100 + 30 * i, 35, (56, 72, 3)),
                               0, 255)
        a = np.zeros((56, 72), np.uint8)
        a[6 * i:40 + 4 * i, 8:64] = 255
        a[25:30, :] = 100
        fr[:, :, 3] = a
        frames.append(fr)
    for blend in (False, True):
        data = encode_animation(frames, distance=1.0, blend=blend)
        oracle = refjxl.decode_frames(data, dtype="uint8",
                                      num_channels=4)
        ours, _ = decode_all(data)
        assert len(oracle) == len(ours) == 3, (blend, len(oracle))
        for i, (o, u) in enumerate(zip(oracle, ours)):
            d = np.abs(o.astype(int) - u.pixels.astype(int)).max()
            assert d <= 1, (blend, i, d)
