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


def test_device_splines_match_host():
    """Spline strokes render as jitted erf splats on device, matching
    the host renderer (splines.cc DrawSegment)."""
    from libjxl_tpu.api.simple import CodecMetadata
    from libjxl_tpu.bitstream.bit_io import BitWriter
    from libjxl_tpu.color.xyb import linear_rgb_to_xyb, srgb_to_linear
    from libjxl_tpu.frame.encode_frame import encode_vardct_frame
    from libjxl_tpu.frame.headers import (BitDepth,
                                          write_codestream_headers)
    from libjxl_tpu.frame.splines import Splines, quantize_spline

    base = np.full((160, 200, 3), 110, np.uint8)
    cps = [(10.0, 20.0), (60.0, 10.0), (100.0, 60.0), (150.0, 120.0)]
    color_dct = np.zeros((3, 32))
    color_dct[1, 0] = 0.4
    color_dct[0, 1] = 0.15
    sigma_dct = np.zeros(32)
    sigma_dct[0] = 2.0
    qs = quantize_spline(cps, color_dct, sigma_dct, 0, 0.0, 1.0)
    s = Splines(splines=[qs], starting_points=[cps[0]])

    meta = CodecMetadata()
    meta.size.set(200, 160)
    meta.m.bit_depth = BitDepth.uint(8)
    meta.m.xyb_encoded = True
    wtr = BitWriter()
    write_codestream_headers(meta, wtr)
    srgb = base.astype(np.float32) / 255.0
    xyb = linear_rgb_to_xyb(srgb_to_linear(srgb).transpose(2, 0, 1))
    encode_vardct_frame(xyb, meta, wtr, distance=1.0, splines=s)
    wtr.align_to_byte()
    data = wtr.get_bytes()

    host = decode(data).pixels.astype(np.int32)
    dev = decode(data, device=True).pixels.astype(np.int32)
    assert np.abs(host - dev).max() <= 1
    # the stroke is actually present
    assert host[:, :, 1].max() > 120


def test_device_patches_match_host():
    """Patch application folds to a per-pixel affine (K, A) applied on
    device; compare against the host patch loop."""
    from libjxl_tpu.api.simple import encode as enc
    rng = np.random.default_rng(11)
    # An image with repeated glyph-like content triggers the text-patch
    # detector (patches + a reference frame).
    img = np.full((160, 200, 3), 240, np.uint8)
    glyph = (rng.random((12, 10, 3)) * 120).astype(np.uint8)
    for gy in range(4):
        for gx in range(8):
            img[10 + gy * 30:22 + gy * 30,
                8 + gx * 22:18 + gx * 22] = glyph
    data = enc(img, distance=1.0, effort=7)
    host = decode(data).pixels.astype(np.int32)
    dev = decode(data, device=True).pixels.astype(np.int32)
    assert np.abs(host - dev).max() <= 1


def test_device_spot_color_matches_host():
    """Spot-color mixing as one jitted program (stage_spot.cc)."""
    img = _img(72, 96, seed=11)
    h, w = img.shape[:2]
    spot = np.zeros((h, w), np.uint8)
    spot[20:40, 30:60] = 200
    spot2 = np.zeros((h, w), np.uint8)
    spot2[10:30, 5:25] = 120
    ecs = [{"type": "spot_color", "data": spot, "name": "ink",
            "spot_color": (1.0, 0.1, 0.2, 0.8)},
           {"type": "spot_color", "data": spot2, "name": "ink2",
            "spot_color": (0.0, 0.9, 0.4, 0.5)}]
    data = encode(img, lossless=True, extra_channels=ecs)
    host = decode(data).pixels.astype(np.int32)
    dev = decode(data, device=True).pixels.astype(np.int32)
    assert np.abs(host - dev).max() <= 1


def test_device_animation_blend_matches_host():
    """Frame blending with alpha on-device (stage_blending.cc):
    decode_all(device=True) keeps the canvas on-device and must match
    the host composition bit-for-bit."""
    from libjxl_tpu.api.simple import decode_all, encode_animation
    rng = np.random.default_rng(12)
    h, w = 64, 80
    frames = []
    for i in range(3):
        fr = np.zeros((h, w, 4), np.uint8)
        fr[:, :, :3] = np.clip(rng.normal(100 + 40 * i, 30, (h, w, 3)),
                               0, 255)
        a = np.zeros((h, w), np.uint8)
        a[8 * i:40 + 8 * i, 10:60] = 255
        a[20:30, :] = 128
        fr[:, :, 3] = a
        frames.append(fr)
    data = encode_animation(frames, distance=1.0, blend=True)
    # Frames 1.. carry BlendMode.BLEND so the alpha-composition path
    # (not just REPLACE) is exercised on both sides.
    host_frames, _ = decode_all(data)
    dev_frames, _ = decode_all(data, device=True)
    assert len(host_frames) == len(dev_frames) == 3
    for hf, df in zip(host_frames, dev_frames):
        assert hf.pixels.shape == df.pixels.shape
        assert np.abs(hf.pixels.astype(np.int32)
                      - df.pixels.astype(np.int32)).max() <= 1
