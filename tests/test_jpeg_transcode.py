"""JPEG parsing + coefficient-preserving transcode
(reference: lib/jxl/jpeg/*, cjxl -j)."""

import io

import numpy as np
import pytest
from PIL import Image

from libjxl_tpu.api import decode
from libjxl_tpu.extras.jpeg_parser import JpegError, parse_jpeg
from libjxl_tpu.extras.jpeg_transcode import transcode_jpeg


def _img(h=120, w=152):
    y, x = np.mgrid[0:h, 0:w]
    return np.clip(np.stack([(128 + 90 * np.sin(x / 17)),
                             (128 + 70 * np.cos(y / 13)),
                             (120 + 60 * np.sin((x + y) / 23))], -1),
                   0, 255).astype(np.uint8)


def _jpeg(img, quality=85, subsampling=0):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality,
                              subsampling=subsampling)
    return buf.getvalue()


def test_parse_jpeg_structure():
    jd = parse_jpeg(_jpeg(_img()))
    assert (jd.width, jd.height) == (152, 120)
    assert len(jd.components) == 3
    assert jd.components[0].coeffs is not None
    assert 0 in jd.quant_tables


def test_parse_jpeg_420():
    jd = parse_jpeg(_jpeg(_img(), subsampling=2))
    assert jd.components[0].h_samp == 2 and jd.components[0].v_samp == 2


def test_transcode_shrinks_and_preserves_pixels():
    data = _jpeg(_img())
    jxl = transcode_jpeg(data)
    assert len(jxl) < len(data)          # recompression must shrink
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    out = decode(jxl).pixels
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 3 and err.mean() < 1.0, (err.mean(), err.max())


def test_transcode_quality_sweep():
    for q in (60, 92):
        data = _jpeg(_img(96, 96), quality=q)
        jxl = transcode_jpeg(data)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        out = decode(jxl).pixels
        assert np.abs(out.astype(int) - ref.astype(int)).mean() < 1.0


@pytest.mark.parametrize("sub,name", [(1, "422"), (2, "420")])
def test_transcode_subsampled(sub, name):
    data = _jpeg(_img(), subsampling=sub)
    jxl = transcode_jpeg(data)
    assert len(jxl) < len(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    out = decode(jxl).pixels
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0, (err.mean(), err.max())


def test_transcode_420_multigroup():
    y, x = np.mgrid[0:300, 0:360]
    img = np.clip(np.stack([(128 + 90 * np.sin(x / 29)),
                            (128 + 70 * np.cos(y / 31)),
                            (120 + 60 * np.sin((x + y) / 37))], -1),
                  0, 255).astype(np.uint8)
    data = _jpeg(img, quality=80, subsampling=2)
    jxl = transcode_jpeg(data)
    assert len(jxl) < len(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    out = decode(jxl).pixels
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0, (err.mean(), err.max())


def test_parse_garbage_raises():
    with pytest.raises(JpegError):
        parse_jpeg(b"\x00" * 100)
    with pytest.raises(JpegError):
        parse_jpeg(b"\xff\xd8" + b"\x12" * 50)


def test_transcode_grayscale():
    y, x = np.mgrid[0:240, 0:320]
    gray = np.clip(128 + 90 * np.sin(x / 17) * np.cos(y / 13),
                   0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "JPEG", quality=85)
    data = buf.getvalue()
    jxl = transcode_jpeg(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    out = decode(jxl).pixels
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 3 and err.mean() < 0.5


@pytest.mark.parametrize("sub", [0, 2])
def test_transcode_progressive(sub):
    data = _jpeg(_img(), subsampling=sub)
    buf = io.BytesIO()
    Image.fromarray(_img()).save(buf, "JPEG", quality=85,
                                 subsampling=sub, progressive=True)
    pdata = buf.getvalue()
    jd_seq = parse_jpeg(data)
    jd_prog = parse_jpeg(pdata)
    assert jd_prog.progressive
    # Progressive scans must reassemble the exact same coefficients.
    for cs, cp in zip(jd_seq.components, jd_prog.components):
        np.testing.assert_array_equal(cs.coeffs, cp.coeffs)
    ref = np.asarray(Image.open(io.BytesIO(pdata)).convert("RGB"))
    out = decode(transcode_jpeg(pdata)).pixels
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


@pytest.mark.parametrize("sub", [0, 2])
def test_jxl_to_jpeg_round_trip_pixel_exact(sub):
    from libjxl_tpu.extras.jpeg_transcode import transcode_jxl_to_jpeg
    data = _jpeg(_img(), subsampling=sub)
    jxl = transcode_jpeg(data)
    back = transcode_jxl_to_jpeg(jxl)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rec = np.asarray(Image.open(io.BytesIO(back)).convert("RGB"))
    # Coefficients ride both directions verbatim: decoded pixels match.
    np.testing.assert_array_equal(ref, rec)


def test_jpeg_writer_coefficients_exact():
    from libjxl_tpu.extras.jpeg_writer import write_jpeg
    data = _jpeg(_img(), subsampling=2)
    jd = parse_jpeg(data)
    jd2 = parse_jpeg(write_jpeg(jd))
    for a, b in zip(jd.components, jd2.components):
        np.testing.assert_array_equal(a.coeffs, b.coeffs)


@pytest.mark.parametrize("sub", [0, 1, 2])
def test_byte_exact_reconstruction(sub):
    from libjxl_tpu.extras.jpeg_transcode import (
        reconstruct_jpeg, transcode_jpeg_container)
    data = _jpeg(_img(), subsampling=sub)
    box = transcode_jpeg_container(data)
    assert len(box) < len(data)  # still smaller incl. jbrd metadata
    assert reconstruct_jpeg(box) == data  # BYTE-exact


def test_byte_exact_with_restart_markers():
    from libjxl_tpu.extras.jpeg_transcode import (
        reconstruct_jpeg, transcode_jpeg_container)
    # PIL has no restart-interval knob; craft via re-emission: parse a
    # jpeg, set DRI, rewrite with our writer, then round-trip that.
    from libjxl_tpu.extras.jpeg_parser import parse_jpeg
    from libjxl_tpu.extras.jpeg_writer import write_jpeg
    base = parse_jpeg(_jpeg(_img(), subsampling=0))
    jpg2 = write_jpeg(base)  # canonical rewrite (no DRI)
    box = transcode_jpeg_container(jpg2)
    assert reconstruct_jpeg(box) == jpg2


def _prog_jpeg(img, subsampling=0, quality=85):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality,
                              subsampling=subsampling, progressive=True)
    return buf.getvalue()


def _with_restarts(data: bytes, interval: int) -> bytes:
    """Synthesize a restart-marker variant of `data` via the bit-exact
    spec writer: inject DRI and re-emit the entropy stream with RSTn
    flushes (dec_jpeg_data_writer.cc handles both on decode).

    The source's per-scan optimized Huffman tables may lack symbols the
    restart-altered stream needs (EOB where the original had none), so
    every table is replaced with a complete one covering all symbols.
    """
    from libjxl_tpu.extras import jbrd
    jd = jbrd.parse_jpeg_full(data)
    jd.restart_interval = interval
    sos = jd.marker_order.index(0xDA)
    jd.marker_order.insert(sos, 0xDD)
    for hc in jd.huffman_code:
        if hc.slot_id & 0x10:   # AC: all 256 symbols (+sentinel)
            hc.counts = [0] * 17
            hc.counts[8], hc.counts[9] = 200, 57
            hc.values = list(range(256)) + [0]
        else:                   # DC: symbols 0..11 at 4 bits (+sentinel)
            hc.counts = [0] * 17
            hc.counts[4] = 13
            hc.values = list(range(12)) + [0]
    # The re-emitted stream has its own flush points; drop recorded
    # ones from the source parse.
    for scan in jd.scan_info:
        scan.reset_points = []
        scan.extra_zero_runs = []
    out = jbrd.write_jpeg_full(jd)
    # Must stay a valid JPEG with identical pixels.
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    np.testing.assert_array_equal(ref, rec)
    return out


@pytest.mark.parametrize("sub", [0, 1, 2])
def test_byte_exact_reconstruction_progressive(sub):
    """Progressive (multi-scan, EOB runs, successive approximation)
    round trip: jpg -> jxl+jbrd -> byte-exact jpg
    (dec_jpeg_data_writer.h:25 WriteJpeg; BASELINE config 4)."""
    from libjxl_tpu.extras.jpeg_transcode import (
        reconstruct_jpeg, transcode_jpeg_container)
    data = _prog_jpeg(_img(), subsampling=sub)
    box = transcode_jpeg_container(data)
    assert reconstruct_jpeg(box) == data


@pytest.mark.parametrize("progressive", [False, True])
def test_byte_exact_reconstruction_restart_markers(progressive):
    """DRI + RSTn streams (sequential and progressive) reconstruct
    byte-exactly, including predictor resets and EOB-run flushes at
    restart boundaries."""
    from libjxl_tpu.extras.jpeg_transcode import (
        reconstruct_jpeg, transcode_jpeg_container)
    # Progressive uses interval=1: the source tables carry no EOBn
    # (n>1) symbols, and flushing at every restart keeps EOB runs <= 1.
    src = (_prog_jpeg if progressive else _jpeg)(_img(), subsampling=2)
    data = _with_restarts(src, interval=1 if progressive else 3)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    box = transcode_jpeg_container(data)
    assert reconstruct_jpeg(box) == data


def test_progressive_jbrd_oracle_interop():
    """Cross-interop on progressive streams: djxl reconstructs OUR
    jbrd container byte-exactly, and we reconstruct djxl's."""
    from libjxl_tpu.extras import refjxl
    from libjxl_tpu.extras.jpeg_transcode import (
        reconstruct_jpeg, transcode_jpeg_container)
    if not refjxl.available():
        pytest.skip("no system libjxl")
    data = _prog_jpeg(_img(), subsampling=2)
    ours = transcode_jpeg_container(data)
    assert refjxl.decode_to_jpeg(ours) == data
    theirs = refjxl.encode_jpeg(data)
    assert reconstruct_jpeg(theirs) == data
