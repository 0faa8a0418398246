"""ISOBMFF container (box) layer for .jxl files.

Reference: lib/jxl/decode.cc ReadSignature / box parsing states,
lib/jxl/encode_internal.h MakeContainerHeader/WriteBoxHeader,
lib/jxl/box_content_decoder.cc. A container file is the 12-byte
signature box, an `ftyp` box, optional metadata boxes (`jxll`, `Exif`,
`xml `, `jumb`, `brob`-wrapped versions), and the codestream as a
single `jxlc` box or a sequence of `jxlp` partial boxes (last one has
its 4-byte index MSB set).
"""

from __future__ import annotations

import dataclasses
import struct

from libjxl_tpu.base.errors import BitstreamError

SIGNATURE_BOX = bytes([0x00, 0x00, 0x00, 0x0C]) + b"JXL " + \
    bytes([0x0D, 0x0A, 0x87, 0x0A])
CODESTREAM_SIGNATURE = b"\xff\x0a"


@dataclasses.dataclass
class Box:
    type: bytes              # 4 bytes
    data: bytes
    unbounded: bool = False  # size-0 box extending to EOF


def _read_box(data: bytes, pos: int) -> tuple[Box, int]:
    if pos + 8 > len(data):
        raise BitstreamError("truncated box header")
    size = struct.unpack(">I", data[pos:pos + 4])[0]
    btype = data[pos + 4:pos + 8]
    header = 8
    if size == 1:
        if pos + 16 > len(data):
            raise BitstreamError("truncated large box header")
        size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
        header = 16
    if size == 0:
        return Box(btype, data[pos + header:], unbounded=True), len(data)
    if size < header or pos + size > len(data):
        raise BitstreamError("box size out of range")
    return Box(btype, data[pos + header:pos + size]), pos + size


def _write_box(btype: bytes, payload: bytes, *, unbounded: bool = False,
               ) -> bytes:
    if unbounded:
        return struct.pack(">I", 0) + btype + payload
    total = 8 + len(payload)
    if total >= 1 << 32:
        return struct.pack(">I", 1) + btype + \
            struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", total) + btype + payload


def is_container(data: bytes) -> bool:
    return data.startswith(SIGNATURE_BOX[:min(len(data), 12)])


def parse_boxes(data: bytes) -> list[Box]:
    """Parses a full container file into its boxes (signature excluded)."""
    if not data.startswith(SIGNATURE_BOX):
        raise BitstreamError("not a JXL container (bad signature box)")
    boxes = []
    pos = 12
    while pos < len(data):
        box, pos = _read_box(data, pos)
        boxes.append(box)
    return boxes


@dataclasses.dataclass
class ContainerContent:
    codestream: bytes
    level: int = 5                       # from jxll box
    exif: bytes | None = None
    xml: list[bytes] = dataclasses.field(default_factory=list)
    jumbf: bytes | None = None
    jpeg_reconstruction: bytes | None = None   # jbrd payload
    other: list[Box] = dataclasses.field(default_factory=list)


def unpack_container(data: bytes) -> ContainerContent:
    """Extracts the codestream and metadata from a container file.

    Bare codestreams (0xFF0A) pass through unchanged.
    """
    if data[:2] == CODESTREAM_SIGNATURE:
        return ContainerContent(codestream=data)
    boxes = parse_boxes(data)
    if not boxes or boxes[0].type != b"ftyp":
        raise BitstreamError("container missing ftyp box")
    ftyp = boxes[0].data
    if ftyp[:4] != b"jxl ":
        raise BitstreamError("ftyp major brand is not 'jxl '")
    out = ContainerContent(codestream=b"")
    parts: dict[int, bytes] = {}
    saw_last = False
    for box in boxes[1:]:
        if box.type == b"brob":
            # Brotli-compressed metadata box: 4-byte inner type +
            # compressed payload (box_content_decoder.cc).
            from libjxl_tpu.extras import brotli
            if len(box.data) < 4:
                raise BitstreamError("brob box too short")
            inner = box.data[:4]
            if inner in (b"brob", b"jxlc", b"jxlp", b"jxll", b"ftyp",
                         b"JXL "):
                raise BitstreamError("brob wrapping not allowed for "
                                     f"{inner!r}")
            box = Box(type=inner, data=brotli.decompress(box.data[4:]))
        if box.type == b"jxlc":
            out.codestream = box.data
            saw_last = True
        elif box.type == b"jxlp":
            if len(box.data) < 4:
                raise BitstreamError("jxlp box too short")
            idx = struct.unpack(">I", box.data[:4])[0]
            if idx & 0x80000000:
                saw_last = True
            parts[idx & 0x7FFFFFFF] = box.data[4:]
        elif box.type == b"jxll":
            if len(box.data) != 1 or box.data[0] not in (5, 10):
                raise BitstreamError("invalid jxll level box")
            out.level = box.data[0]
        elif box.type == b"Exif":
            # 4-byte tiff header offset precedes the payload.
            out.exif = box.data
        elif box.type == b"xml ":
            out.xml.append(box.data)
        elif box.type == b"jumb":
            out.jumbf = box.data
        elif box.type == b"jbrd":
            out.jpeg_reconstruction = box.data
        else:
            out.other.append(box)
    if parts:
        out.codestream = b"".join(parts[i] for i in sorted(parts))
    if not out.codestream or not saw_last:
        raise BitstreamError("container has no complete codestream")
    if out.codestream[:2] != CODESTREAM_SIGNATURE:
        raise BitstreamError("container codestream lacks JXL signature")
    return out


def pack_container(codestream: bytes, *, level: int = 5,
                   exif: bytes | None = None,
                   xml: list[bytes] | None = None,
                   jpeg_reconstruction: bytes | None = None,
                   extra_boxes: list | None = None,
                   split: int = 0,
                   compress_boxes: bool = False) -> bytes:
    """Wraps a bare codestream into a container file.

    split > 0 emits the codestream as that many jxlp partial boxes
    (streaming layout); otherwise a single jxlc box. compress_boxes
    wraps metadata boxes (Exif/xml/jumb) in Brotli `brob` boxes
    (encode.cc JXL_ENC_BOX_COMPRESSED analogue).
    """
    if codestream[:2] != CODESTREAM_SIGNATURE:
        raise BitstreamError("not a JXL codestream")
    out = bytearray(SIGNATURE_BOX)
    out += _write_box(b"ftyp", b"jxl \x00\x00\x00\x00jxl ")
    if level != 5:
        out += _write_box(b"jxll", bytes([level]))
    def _meta_box(btype: bytes, payload: bytes) -> bytes:
        if compress_boxes:
            from libjxl_tpu.extras import brotli
            return _write_box(b"brob", btype + brotli.compress(payload))
        return _write_box(btype, payload)

    if exif is not None:
        out += _meta_box(b"Exif", exif)
    for x in (xml or []):
        out += _meta_box(b"xml ", x)
    if jpeg_reconstruction is not None:
        out += _write_box(b"jbrd", jpeg_reconstruction)
    for (btype, payload) in (extra_boxes or []):
        # e.g. jhgm gain-map boxes, jumb JUMBF: carried verbatim.
        out += _write_box(bytes(btype), payload)
    if split > 0:
        n = max(1, min(split, len(codestream)))
        chunk = (len(codestream) + n - 1) // n
        pieces = [codestream[i * chunk:(i + 1) * chunk] for i in range(n)]
        pieces = [p for p in pieces if p]
        for i, piece in enumerate(pieces):
            idx = i | (0x80000000 if i == len(pieces) - 1 else 0)
            out += _write_box(b"jxlp", struct.pack(">I", idx) + piece)
    else:
        out += _write_box(b"jxlc", codestream)
    return bytes(out)
