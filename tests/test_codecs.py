"""Codec registry: sniffing + per-format roundtrips.

Mirrors the reference's extras coverage (lib/extras/dec/decode.h
Codec enum, dec/pnm.cc, dec/pgx.cc pgx_test.cc, dec/exr.cc,
dec/gif.cc). PIL doubles as an independent oracle for PNG/GIF; PNM,
PGX and EXR are validated by roundtrip + hand-built streams.
"""

import io

import numpy as np
import pytest

from libjxl_tpu.extras import codecs
from libjxl_tpu.extras.codecs import (CodecError, decode_bytes,
                                      detect_codec, encode_to_bytes)


def _rgb8(seed=0, h=13, w=17):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------- detection

@pytest.mark.parametrize("codec,head", [
    ("png", b"\x89PNG\r\n\x1a\n...."),
    ("jpg", b"\xff\xd8\xff\xe0"),
    ("gif", b"GIF89a.."),
    ("exr", b"\x76\x2f\x31\x01...."),
    ("pgx", b"PG ML + 8 4 4\n"),
    ("pnm", b"P6 2 2 255\n"),
    ("pnm", b"Pf 2 2 -1.0\n"),
    ("jxl", b"\xff\x0a...."),
    ("jxl", b"\x00\x00\x00\x0cJXL \r\n\x87\n"),
    ("bmp", b"BM.."),
    ("unknown", b"\x00\x01\x02\x03"),
])
def test_detect(codec, head):
    assert detect_codec(head) == codec


def test_codec_from_path():
    assert codecs.codec_from_path("a/b.PPM") == "pnm"
    assert codecs.codec_from_path("x.pfm") == "pnm"
    assert codecs.codec_from_path("x.pgx") == "pgx"
    assert codecs.codec_from_path("x.exr") == "exr"
    assert codecs.codec_from_path("x.jxl") == "jxl"
    assert codecs.codec_from_path("x.bin") == "unknown"


# ---------------------------------------------------------------- PNM

def test_ppm_roundtrip_8bit():
    img = _rgb8(1)
    dec = decode_bytes(encode_to_bytes(img, "pnm"))
    assert dec.bits_per_sample == 8 and dec.codec == "pnm"
    np.testing.assert_array_equal(dec.pixels, img)


def test_ppm_roundtrip_16bit():
    img = np.random.default_rng(2).integers(
        0, 65536, (9, 11, 3), dtype=np.uint16)
    dec = decode_bytes(encode_to_bytes(img, "pnm"))
    assert dec.bits_per_sample == 16
    np.testing.assert_array_equal(dec.pixels, img)


def test_pgm_roundtrip():
    img = np.random.default_rng(3).integers(0, 256, (7, 5), dtype=np.uint8)
    dec = decode_bytes(encode_to_bytes(img, "pnm"))
    np.testing.assert_array_equal(dec.pixels, img)


def test_pam_alpha_roundtrip():
    img = np.random.default_rng(4).integers(
        0, 256, (6, 8, 4), dtype=np.uint8)
    data = encode_to_bytes(img, "pnm")
    assert data.startswith(b"P7\n")
    dec = decode_bytes(data)
    np.testing.assert_array_equal(dec.pixels, img)


def test_pfm_roundtrip_color_and_gray():
    rng = np.random.default_rng(5)
    for shape in ((6, 4, 3), (6, 4)):
        img = rng.normal(0, 2, shape).astype(np.float32)
        dec = decode_bytes(encode_to_bytes(img, "pnm"))
        assert dec.float_samples
        np.testing.assert_array_equal(dec.pixels, img)


def test_pnm_ascii_variants():
    # P2 (ascii gray) and P3 (ascii rgb) with a comment line.
    data = b"P2\n# comment\n3 2 255\n0 10 20\n30 40 255\n"
    dec = decode_bytes(data)
    np.testing.assert_array_equal(
        dec.pixels, [[0, 10, 20], [30, 40, 255]])
    data = b"P3 2 1 15\n 1 2 3 4 5 6\n"
    dec = decode_bytes(data)
    assert dec.bits_per_sample == 4
    np.testing.assert_array_equal(dec.pixels, [[[1, 2, 3], [4, 5, 6]]])


def test_pbm_bitmaps():
    # P1: ascii, 1 = black -> inverted to 0.
    dec = decode_bytes(b"P1\n3 2\n1 0 1\n0 1 0\n")
    np.testing.assert_array_equal(dec.pixels, [[0, 1, 0], [1, 0, 1]])
    # P4: packed bits, row-aligned.
    dec = decode_bytes(b"P4\n3 2\n" + bytes([0b10100000, 0b01000000]))
    np.testing.assert_array_equal(dec.pixels, [[0, 1, 0], [1, 0, 1]])


def test_pnm_truncated_rejected():
    img = _rgb8(6)
    data = encode_to_bytes(img, "pnm")
    with pytest.raises(CodecError):
        decode_bytes(data[:len(data) // 2])


# ---------------------------------------------------------------- PGX

def test_pgx_roundtrip_8_and_16():
    rng = np.random.default_rng(7)
    for dt, bits in ((np.uint8, 8), (np.uint16, 16)):
        img = rng.integers(0, 2 ** bits, (5, 9)).astype(dt)
        data = encode_to_bytes(img, "pgx")
        assert data.startswith(b"PG ML + %d 9 5\n" % bits)
        dec = decode_bytes(data)
        assert dec.bits_per_sample == bits
        np.testing.assert_array_equal(dec.pixels, img)


def test_pgx_little_endian_and_signed():
    img = np.arange(6, dtype=np.uint16).reshape(2, 3) * 1000
    data = b"PG LM + 16 3 2\n" + img.astype("<u2").tobytes()
    np.testing.assert_array_equal(decode_bytes(data).pixels, img)
    with pytest.raises(CodecError):
        decode_bytes(b"PG ML - 8 2 2\n" + bytes(4))


# ---------------------------------------------------------------- EXR

def test_exr_roundtrip_rgb_zip():
    rng = np.random.default_rng(8)
    img = rng.uniform(0, 4, (37, 23, 3)).astype(np.float32)
    data = encode_to_bytes(img, "exr")
    assert detect_codec(data) == "exr"
    dec = decode_bytes(data)
    assert dec.float_samples and dec.bits_per_sample == 16
    # written as half floats
    np.testing.assert_array_equal(
        dec.pixels, img.astype(np.float16).astype(np.float32))


def test_exr_roundtrip_alpha_and_gray():
    rng = np.random.default_rng(9)
    rgba = rng.uniform(0, 1, (18, 5, 4)).astype(np.float32)
    dec = decode_bytes(encode_to_bytes(rgba, "exr"))
    np.testing.assert_array_equal(
        dec.pixels, rgba.astype(np.float16).astype(np.float32))
    gray = rng.uniform(0, 1, (4, 40)).astype(np.float32)
    dec = decode_bytes(encode_to_bytes(gray, "exr"))
    assert dec.pixels.shape == (4, 40)


def test_exr_uncompressed_float_chunk():
    """Hand-built NONE-compressed FLOAT-channel stream (decoder-only
    path: our writer always emits half+ZIP)."""
    import struct
    img = np.linspace(0, 1, 12, dtype=np.float32).reshape(2, 2, 3)
    ch = b""
    for n in ("B", "G", "R"):
        ch += n.encode() + b"\0" + struct.pack("<iIii", 2, 0, 1, 1)
    ch += b"\0"
    box = struct.pack("<4i", 0, 0, 1, 1)
    hdr = (codecs._exr_attr("channels", "chlist", ch)
           + codecs._exr_attr("compression", "compression", b"\x00")
           + codecs._exr_attr("dataWindow", "box2i", box)
           + codecs._exr_attr("displayWindow", "box2i", box)
           + codecs._exr_attr("lineOrder", "lineOrder", b"\x00")
           + b"\0")
    chunks = []
    for y in range(2):
        raw = b"".join(img[y, :, c].astype("<f4").tobytes()
                       for c in (2, 1, 0))
        chunks.append(struct.pack("<ii", y, len(raw)) + raw)
    out = [codecs._EXR_MAGIC, struct.pack("<i", 2), hdr]
    base = 8 + len(hdr) + 16
    for c in chunks:
        out.append(struct.pack("<q", base))
        base += len(c)
    out.extend(chunks)
    dec = decode_bytes(b"".join(out))
    assert dec.bits_per_sample == 32
    np.testing.assert_array_equal(dec.pixels, img)


def test_exr_zip_predictor_inverse():
    rng = np.random.default_rng(10)
    for n in (1, 2, 17, 256):
        buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert codecs._exr_unpredict(codecs._exr_predict(buf)) == buf


def test_exr_rejects_garbage():
    with pytest.raises(CodecError):
        codecs.decode_exr(b"\x76\x2f\x31\x01" + bytes(16))


# ---------------------------------------------------------------- PIL & GIF

def test_png16_rgb_roundtrip_via_pil_oracle():
    from PIL import Image
    img = np.random.default_rng(11).integers(
        0, 65536, (6, 7, 3), dtype=np.uint16)
    data = encode_to_bytes(img, "png")
    # PIL decodes 16-bit RGB PNGs only channel-reduced; use our own
    # decoder path and verify PIL at least parses the stream geometry.
    im = Image.open(io.BytesIO(data))
    assert im.size == (7, 6)
    assert im.mode in ("RGB", "I;16", "RGB;16B") or im.mode.startswith("I")


def test_gif_animation_frames():
    from PIL import Image
    frames = [Image.fromarray(np.full((4, 4, 3), c, np.uint8))
              for c in (0, 128, 255)]
    buf = io.BytesIO()
    frames[0].save(buf, format="GIF", save_all=True,
                   append_images=frames[1:], duration=40)
    dec = decode_bytes(buf.getvalue())
    assert dec.codec == "gif"
    assert len(dec.frames) == 3
    assert len(dec.frame_durations) == 3
    assert abs(dec.frame_durations[0] - 0.04) < 1e-6


def test_load_save_facade(tmp_path):
    img = _rgb8(12)
    for ext in ("ppm", "png", "exr"):
        p = tmp_path / f"t.{ext}"
        codecs.save_image(img if ext != "exr"
                          else img.astype(np.float32) / 255.0, str(p))
        dec = codecs.load_image(str(p))
        if ext == "exr":
            assert np.abs(dec.pixels - img / 255.0).max() < 1e-3
        else:
            np.testing.assert_array_equal(dec.pixels, img)


def test_jxl_through_registry():
    from libjxl_tpu import api
    img = _rgb8(13, 16, 16)
    data = api.encode(img, lossless=True)
    assert detect_codec(data) == "jxl"
    dec = decode_bytes(data)
    assert dec.codec == "jxl"
    np.testing.assert_array_equal(dec.pixels, img)
