"""Container (ISOBMFF box) layer tests — mirrors reference box_test.cc."""

import struct

import numpy as np
import pytest

from libjxl_tpu.api import decode, encode
from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.container.boxes import (
    SIGNATURE_BOX, is_container, pack_container, parse_boxes, unpack_container,
)


def _img():
    rng = np.random.default_rng(5)
    return rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)


def test_pack_unpack_jxlc_roundtrip():
    cs = encode(_img(), lossless=True)
    box = pack_container(cs)
    assert is_container(box)
    assert unpack_container(box).codestream == cs
    np.testing.assert_array_equal(decode(box).pixels, _img())


def test_pack_unpack_jxlp_split():
    cs = encode(_img(), lossless=True)
    box = pack_container(cs, split=3)
    assert box.count(b"jxlp") == 3
    assert unpack_container(box).codestream == cs


def test_container_metadata_boxes():
    cs = encode(_img(), lossless=True)
    exif = b"\x00\x00\x00\x00MM\x00\x2a" + b"\x00" * 8
    xml = b"<x:xmpmeta/>"
    box = pack_container(cs, exif=exif, xml=[xml], level=10)
    content = unpack_container(box)
    assert content.codestream == cs
    assert content.exif == exif
    assert content.xml == [xml]
    assert content.level == 10


def test_encode_container_flag():
    data = encode(_img(), lossless=True, container=True)
    assert data.startswith(SIGNATURE_BOX)
    np.testing.assert_array_equal(decode(data).pixels, _img())


def test_bare_codestream_passthrough():
    cs = encode(_img(), lossless=True)
    assert unpack_container(cs).codestream == cs


def test_bad_signature_rejected():
    with pytest.raises(BitstreamError):
        parse_boxes(b"\x00\x00\x00\x0cJXL!\x0d\x0a\x87\x0a")


def test_truncated_box_rejected():
    cs = encode(_img(), lossless=True)
    box = pack_container(cs)
    with pytest.raises(BitstreamError):
        unpack_container(box[:-5])


def test_box_size_out_of_range():
    bad = SIGNATURE_BOX + struct.pack(">I", 100) + b"ftyp" + b"x" * 10
    with pytest.raises(BitstreamError):
        parse_boxes(bad)


def test_unknown_boxes_preserved():
    cs = encode(_img(), lossless=True)
    box = pack_container(cs)
    extra = struct.pack(">I", 12) + b"abcd" + b"1234"
    content = unpack_container(box + extra)
    assert content.codestream == cs
    assert content.other[0].type == b"abcd"
    assert content.other[0].data == b"1234"


def test_jxlp_out_of_order_assembly():
    import struct
    from libjxl_tpu.container.boxes import _write_box
    cs = encode(_img(), lossless=True)
    third = len(cs) // 3
    parts = [cs[:third], cs[third:2 * third], cs[2 * third:]]
    out = bytearray(SIGNATURE_BOX)
    out += _write_box(b"ftyp", b"jxl \x00\x00\x00\x01jxl ")
    order = [2, 0, 1]  # deliver out of order
    for i in order:
        idx = i | (0x80000000 if i == 2 else 0)
        out += _write_box(b"jxlp", struct.pack(">I", idx) + parts[i])
    content = unpack_container(bytes(out))
    assert content.codestream == cs
