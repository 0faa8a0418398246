"""Corrupted/truncated stream robustness — decoding must raise JxlError,
never crash or hang (reference: djxl_fuzzer / decode_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.api import decode, encode
from libjxl_tpu.base.errors import JxlError


def _img():
    y, x = np.mgrid[0:48, 0:64]
    return np.stack([x % 256, y % 256, (x + y) % 256], -1).astype(np.uint8)


@pytest.fixture(scope="module")
def streams():
    img = _img()
    return [encode(img, lossless=True), encode(img, distance=1.0),
            encode(img, distance=1.0, progressive=True)]


def test_truncation_ladder(streams):
    for data in streams:
        for frac in (0.1, 0.3, 0.5, 0.7, 0.9, 0.98):
            cut = data[:int(len(data) * frac)]
            try:
                decode(cut)
            except Exception as e:
                assert isinstance(e, JxlError), (frac, type(e))


def test_bit_flips(streams):
    rng = np.random.default_rng(42)
    for data in streams:
        arr = np.frombuffer(data, np.uint8).copy()
        for _ in range(40):
            corrupted = arr.copy()
            pos = rng.integers(0, len(arr))
            corrupted[pos] ^= 1 << rng.integers(0, 8)
            try:
                res = decode(corrupted.tobytes())
                # Decoding may "succeed" with different pixels; that's
                # fine as long as shapes stay sane.
                assert res.pixels.shape[0] <= 1 << 20
            except Exception as e:
                assert isinstance(e, JxlError), type(e)


def test_random_garbage():
    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 10, 100, 1000):
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        with pytest.raises(JxlError):
            decode(b"\xff\x0a" + blob)


def test_empty_and_tiny():
    for blob in (b"", b"\xff", b"\x00", b"\xff\x0a"):
        with pytest.raises(JxlError):
            decode(blob)


def test_jpeg_parser_fuzz():
    import io
    from PIL import Image
    from libjxl_tpu.extras.jpeg_parser import JpegError, parse_jpeg

    rng = np.random.default_rng(13)
    buf = io.BytesIO()
    Image.fromarray(_img()).save(buf, "JPEG", quality=80)
    data = bytearray(buf.getvalue())
    for _ in range(60):
        corrupted = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            corrupted[rng.integers(0, len(data))] = rng.integers(0, 256)
        try:
            parse_jpeg(bytes(corrupted))
        except Exception as e:
            assert isinstance(e, JpegError), type(e)
    for n in (0, 2, 10, 50):
        with pytest.raises(Exception):
            parse_jpeg(bytes(rng.integers(0, 256, n, dtype=np.uint8)))


def test_jxl_to_jpeg_rejects_non_transcode():
    from libjxl_tpu.extras.jpeg_parser import JpegError
    from libjxl_tpu.extras.jpeg_transcode import transcode_jxl_to_jpeg
    data = encode(_img(), distance=1.0)  # XYB frame, not YCbCr
    with pytest.raises(JpegError):
        transcode_jxl_to_jpeg(data)
