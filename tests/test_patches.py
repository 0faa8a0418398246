"""Patch dictionary: reference frames + blits
(reference: dec_patch_dictionary.cc, patch_dictionary_internal.h)."""

import numpy as np
import pytest

from libjxl_tpu.api import decode
from libjxl_tpu.api.simple import CodecMetadata
from libjxl_tpu.bitstream.bit_io import BitWriter
from libjxl_tpu.color.xyb import linear_rgb_to_xyb, srgb_to_linear
from libjxl_tpu.frame.encode_frame import encode_vardct_frame
from libjxl_tpu.frame.headers import BitDepth, write_codestream_headers
from libjxl_tpu.frame.patches import (
    PatchBlendMode, PatchBlending, PatchDictionary, PatchPosition,
    PatchRefPosition,
)


def _to_xyb(img):
    srgb = img.astype(np.float32) / 255.0
    return linear_rgb_to_xyb(srgb_to_linear(srgb).transpose(2, 0, 1))


def _encode_with_patches(base, ref_img, pd):
    h, w = base.shape[:2]
    meta = CodecMetadata()
    meta.size.set(w, h)
    meta.m.bit_depth = BitDepth.uint(8)
    meta.m.xyb_encoded = True
    wtr = BitWriter()
    write_codestream_headers(meta, wtr)
    encode_vardct_frame(_to_xyb(ref_img), meta, wtr, distance=1.0,
                        save_as_reference=1)
    encode_vardct_frame(_to_xyb(base), meta, wtr, distance=1.0, patches=pd)
    wtr.align_to_byte()
    return wtr.get_bytes()


def _scene():
    y, x = np.mgrid[0:64, 0:80]
    base = np.stack([(100 + 50 * np.sin(x / 9)), (120 + 40 * np.cos(y / 7)),
                     (90 + 60 * np.sin((x + y) / 11))], -1) \
        .clip(0, 255).astype(np.uint8)
    sy, sx = np.mgrid[0:24, 0:24]
    sprite = np.stack([np.full((24, 24), 220), 40 + sx * 4, 40 + sy * 4],
                      -1).clip(0, 255).astype(np.uint8)
    ref_img = np.zeros((64, 80, 3), np.uint8)
    ref_img[:24, :24] = sprite
    return base, ref_img, sprite


def test_patch_replace_two_positions():
    base, ref_img, sprite = _scene()
    pd = PatchDictionary(
        ref_positions=[PatchRefPosition(1, 0, 0, 24, 24)],
        positions=[PatchPosition(8, 8, 0), PatchPosition(48, 32, 0)],
        blendings=[[PatchBlending(PatchBlendMode.REPLACE)],
                   [PatchBlending(PatchBlendMode.REPLACE)]])
    res = decode(_encode_with_patches(base, ref_img, pd))
    for (px, py) in [(8, 8), (48, 32)]:
        err = np.abs(res.pixels[py:py + 24, px:px + 24].astype(int)
                     - sprite.astype(int)).mean()
        assert err < 8, err
    err_base = np.abs(res.pixels[40:, :40].astype(int)
                      - base[40:, :40].astype(int)).mean()
    assert err_base < 5


def test_patch_none_mode_is_noop():
    base, ref_img, _ = _scene()
    pd = PatchDictionary(
        ref_positions=[PatchRefPosition(1, 0, 0, 24, 24)],
        positions=[PatchPosition(8, 8, 0)],
        blendings=[[PatchBlending(PatchBlendMode.NONE)]])
    res = decode(_encode_with_patches(base, ref_img, pd))
    err = np.abs(res.pixels[8:32, 8:32].astype(int)
                 - base[8:32, 8:32].astype(int)).mean()
    assert err < 5, err


def test_patch_bad_reference_rejected():
    base, ref_img, _ = _scene()
    pd = PatchDictionary(
        ref_positions=[PatchRefPosition(2, 0, 0, 24, 24)],  # empty slot
        positions=[PatchPosition(0, 0, 0)],
        blendings=[[PatchBlending(PatchBlendMode.REPLACE)]])
    with pytest.raises(Exception):
        decode(_encode_with_patches(base, ref_img, pd))


def test_dots_detection_preserves_impulses():
    from libjxl_tpu.api import decode as api_decode, encode as api_encode
    y, x = np.mgrid[0:128, 0:160]
    img = np.stack([(110 + 60 * np.sin(x / 37)), (115 + 50 * np.cos(y / 29)),
                    (105 + 40 * np.sin((x + y) / 47))],
                   -1).clip(0, 255).astype(np.uint8)
    pos = [(20, 30), (50, 90), (90, 40), (100, 130)]
    for (py, px) in pos:
        img[py, px] = [255, 240, 250]
    r_plain = api_decode(api_encode(img, distance=1.0)).pixels
    r_dots = api_decode(api_encode(img, distance=1.0, dots=True)).pixels
    err_plain = np.mean([np.abs(r_plain[p].astype(int)
                                - img[p].astype(int)).mean() for p in pos])
    err_dots = np.mean([np.abs(r_dots[p].astype(int)
                               - img[p].astype(int)).mean() for p in pos])
    # Sub-8x8 ACS (IDENTITY/DCT2x2) already reproduces impulses well in
    # the plain encode, so dots can no longer halve the error — they
    # must still keep the impulses accurate and not hurt.
    assert err_dots <= max(err_plain * 1.05, 1.0), (err_plain, err_dots)
    assert err_dots < 6.0, err_dots


def test_dots_noop_on_smooth_image():
    from libjxl_tpu.api import encode as api_encode
    y, x = np.mgrid[0:64, 0:64]
    img = np.stack([x * 2 % 256] * 3, -1).astype(np.uint8)
    assert len(api_encode(img, distance=1.0, dots=True)) == \
        len(api_encode(img, distance=1.0))


class TestTextPatchDetection:
    """enc_patch_dictionary.cc:231 FindTextLikePatches analogue."""

    def _screenshot(self):
        img = np.full((192, 320, 3), 235, np.uint8)
        glyph = np.zeros((9, 7), bool)
        glyph[1:8, 1] = True
        glyph[1, 2:6] = True
        glyph[4, 2:5] = True
        for y in range(10, 170, 24):
            for x in range(12, 300, 13):
                img[y:y + 9, x:x + 7][glyph] = (30, 30, 120)
        return img

    def test_detects_repeated_glyphs(self):
        from libjxl_tpu.color.xyb import linear_rgb_to_xyb, srgb_to_linear
        from libjxl_tpu.frame.text_patches import find_text_like_patches
        img = self._screenshot()
        xyb = linear_rgb_to_xyb(
            srgb_to_linear(img.astype(np.float32) / 255).transpose(2, 0, 1))
        found = find_text_like_patches(xyb)
        assert len(found) >= 1
        assert sum(len(p["positions"]) for p in found) >= 50

    def test_no_false_positives_on_photo(self):
        from libjxl_tpu.color.xyb import linear_rgb_to_xyb, srgb_to_linear
        from libjxl_tpu.frame.text_patches import find_text_like_patches
        rng = np.random.default_rng(4)
        img = np.clip(rng.normal(128, 40, (128, 160, 3)),
                      0, 255).astype(np.uint8)
        xyb = linear_rgb_to_xyb(
            srgb_to_linear(img.astype(np.float32) / 255).transpose(2, 0, 1))
        assert find_text_like_patches(xyb) == []

    def test_encode_roundtrip_smaller_and_better(self):
        from libjxl_tpu.api.simple import decode, encode
        img = self._screenshot()
        with_p = encode(img, distance=1.0, effort=5, patches=True)
        without = encode(img, distance=1.0, effort=5, patches=False)
        assert len(with_p) < len(without) / 2
        out = decode(with_p).pixels
        err = np.abs(out.astype(int) - img.astype(int))
        assert np.sqrt((err.astype(float) ** 2).mean()) < 4.0

    def test_ref_decodes_patch_stream(self):
        from libjxl_tpu.api.simple import decode, encode
        from libjxl_tpu.extras import refjxl
        if not refjxl.available():
            import pytest
            pytest.skip("system libjxl unavailable")
        img = self._screenshot()
        data = encode(img, distance=1.0, effort=5, patches=True)
        ours = decode(data).pixels
        ref = refjxl.decode(data, dtype="uint8").pixels
        assert np.abs(ref.astype(int) - ours.astype(int)).max() <= 1
