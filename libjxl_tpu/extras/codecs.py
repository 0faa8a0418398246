"""Image codec registry: sniffing facade over per-format coders.

TPU-framework analogue of the reference's extras codec facade
(lib/extras/dec/decode.h:30-62 Codec enum / DetectCodec / DecodeBytes,
lib/extras/enc/encode.h Encoder::FromExtension). Formats:

- PNM family (lib/extras/dec/pnm.cc): P1-P6, P7 PAM (GRAYSCALE/RGB
  with optional _ALPHA), PF/Pf PFM float maps — decode + encode.
- PGX (lib/extras/dec/pgx.cc, JPEG 2000 conformance grayscale) —
  decode + encode ("PG ML + <bits> <w> <h>", big-endian samples).
- EXR (lib/extras/dec/exr.cc semantics, self-contained subset instead
  of the OpenEXR library): single-part scanline images, NONE/ZIPS/ZIP
  compression, HALF/FLOAT/UINT channels — decode + encode (half,
  ZIP-16 like the reference's RgbaOutputFile default).
- PNG / JPEG / GIF / BMP / TIFF / WEBP through PIL (GIF animations
  surface per-frame arrays + durations, dec/gif.cc analogue).
- JXL routed to the in-tree codec (dec/jxl.cc analogue).

All decoders return a DecodedImage; pixels are (H, W) or (H, W, C)
uint8 / uint16 / float32 arrays.
"""

from __future__ import annotations

import io
import os
import re
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

from libjxl_tpu.base.errors import JxlError


class CodecError(JxlError):
    pass


@dataclass
class DecodedImage:
    pixels: np.ndarray
    bits_per_sample: int
    float_samples: bool = False
    codec: str = ""
    icc: bytes | None = None
    # Animations (GIF/APNG): all frames incl. pixels' (the first), with
    # per-frame durations in seconds.
    frames: list = field(default_factory=list)
    frame_durations: list = field(default_factory=list)


# ---------------------------------------------------------------------------
# Detection

_PIL_CODECS = {"png", "jpg", "gif", "bmp", "tiff", "webp"}

_EXT_CODEC = {
    ".png": "png", ".apng": "png", ".jpg": "jpg", ".jpeg": "jpg",
    ".gif": "gif", ".bmp": "bmp", ".tif": "tiff", ".tiff": "tiff",
    ".webp": "webp", ".pnm": "pnm", ".pbm": "pnm", ".pgm": "pnm",
    ".ppm": "pnm", ".pam": "pnm", ".pfm": "pnm", ".pgx": "pgx",
    ".exr": "exr", ".jxl": "jxl",
}


def detect_codec(data: bytes) -> str:
    """Sniff the codec from magic bytes (dec/decode.cc DetectCodec)."""
    if len(data) < 4:
        return "unknown"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpg"
    if data[:4] in (b"GIF8",):
        return "gif"
    if data[:4] == b"\x76\x2f\x31\x01":
        return "exr"
    if data[:2] == b"PG":
        return "pgx"
    if data[0:1] == b"P" and data[1:2] in b"1234567Ff":
        return "pnm"
    if data[:2] == b"\xff\x0a":
        return "jxl"
    if data[:12] == b"\x00\x00\x00\x0cJXL \r\n\x87\n":
        return "jxl"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return "unknown"


def codec_from_path(path: str) -> str:
    """Codec from a file extension (dec/decode.cc CodecFromPath)."""
    return _EXT_CODEC.get(os.path.splitext(path)[1].lower(), "unknown")


# ---------------------------------------------------------------------------
# PNM family

_WS = re.compile(rb"(?:\s|#[^\n]*\n)+")


class _TokenReader:
    """Whitespace/comment-skipping ASCII token reader for PNM headers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos

    def token(self) -> bytes:
        m = _WS.match(self.data, self.pos)
        if m:
            self.pos = m.end()
        start = self.pos
        while self.pos < len(self.data) and \
                not self.data[self.pos:self.pos + 1].isspace():
            self.pos += 1
        if start == self.pos:
            raise CodecError("PNM: truncated header")
        return self.data[start:self.pos]

    def uint(self) -> int:
        t = self.token()
        if not t.isdigit():
            raise CodecError(f"PNM: expected number, got {t!r}")
        return int(t)

    def skip_one_ws(self):
        self.pos += 1


def decode_pnm(data: bytes) -> DecodedImage:
    """P1-P6 / P7 PAM / PF,Pf PFM (dec/pnm.cc)."""
    if data[:1] != b"P":
        raise CodecError("PNM: bad signature")
    kind = data[1:2]
    if kind == b"7":
        return _decode_pam(data)
    if kind in (b"F", b"f"):
        return _decode_pfm(data)
    if kind not in b"123456":
        raise CodecError("PNM: unknown type")
    n = int(kind)
    r = _TokenReader(data, 2)
    w = r.uint()
    h = r.uint()
    maxval = 1 if n in (1, 4) else r.uint()
    if not (0 < maxval < 65536):
        raise CodecError("PNM: bad maxval")
    channels = 3 if n in (3, 6) else 1
    if n <= 3:
        # ASCII samples
        vals = np.array([int(r.token()) for _ in range(w * h * channels)],
                        np.uint16)
        if n == 1:
            vals = 1 - vals  # PBM: 1 = black
    else:
        r.skip_one_ws()  # single whitespace byte after maxval
        raw = data[r.pos:]
        if n == 4:
            stride = (w + 7) // 8
            if len(raw) < stride * h:
                raise CodecError("PNM: truncated data")
            bits = np.unpackbits(
                np.frombuffer(raw[:stride * h], np.uint8).reshape(h, stride),
                axis=1)[:, :w]
            vals = (1 - bits).astype(np.uint16)
        else:
            count = w * h * channels
            dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
            need = count * dt.itemsize
            if len(raw) < need:
                raise CodecError("PNM: truncated data")
            vals = np.frombuffer(raw[:need], dt).astype(np.uint16)
    bits = maxval.bit_length()
    arr = vals.reshape(h, w, channels) if channels > 1 else \
        vals.reshape(h, w)
    if maxval <= 255:
        arr = arr.astype(np.uint8)
    return DecodedImage(arr, bits, codec="pnm")


def _decode_pam(data: bytes) -> DecodedImage:
    """P7 Arbitrary Map (dec/pnm.cc ParseHeaderPAM)."""
    end = data.find(b"ENDHDR\n")
    if end < 0:
        raise CodecError("PAM: missing ENDHDR")
    fields = {}
    tupltype = b""
    for line in data[3:end].split(b"\n"):
        line = line.strip()
        if not line or line.startswith(b"#"):
            continue
        parts = line.split(None, 1)
        if parts[0] == b"TUPLTYPE":
            tupltype = parts[1] if len(parts) > 1 else b""
        elif len(parts) == 2:
            fields[parts[0]] = parts[1]
    try:
        w = int(fields[b"WIDTH"])
        h = int(fields[b"HEIGHT"])
        depth = int(fields[b"DEPTH"])
        maxval = int(fields[b"MAXVAL"])
    except (KeyError, ValueError) as e:
        raise CodecError(f"PAM: bad header ({e})")
    if not (1 <= depth <= 4 and 0 < maxval < 65536):
        raise CodecError("PAM: bad DEPTH/MAXVAL")
    raw = data[end + 7:]
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    need = w * h * depth * dt.itemsize
    if len(raw) < need:
        raise CodecError("PAM: truncated data")
    arr = np.frombuffer(raw[:need], dt).reshape(h, w, depth)
    arr = arr.astype(np.uint16 if maxval > 255 else np.uint8)
    if depth == 1:
        arr = arr[:, :, 0]
    del tupltype  # informative only; DEPTH fixes the channel layout
    return DecodedImage(arr, maxval.bit_length(), codec="pnm")


def _decode_pfm(data: bytes) -> DecodedImage:
    """PF (color) / Pf (gray) float maps, bottom-up rows; the scale
    factor's sign selects endianness (dec/pnm.cc ParseHeaderPFM)."""
    color = data[1:2] == b"F"
    r = _TokenReader(data, 2)
    w = r.uint()
    h = r.uint()
    scale = float(r.token())
    if scale == 0:
        raise CodecError("PFM: bad scale factor value")
    r.skip_one_ws()
    chan = 3 if color else 1
    dt = np.dtype("<f4") if scale < 0 else np.dtype(">f4")
    need = w * h * chan * 4
    raw = data[r.pos:]
    if len(raw) < need:
        raise CodecError("PFM: truncated data")
    arr = np.frombuffer(raw[:need], dt).astype(np.float32)
    arr = arr.reshape(h, w, chan) if color else arr.reshape(h, w)
    arr = arr[::-1].copy()  # bottom-up
    return DecodedImage(arr, 32, float_samples=True, codec="pnm")


def encode_pnm(arr: np.ndarray, force_pam: bool = False) -> bytes:
    """PGM/PPM for 1/3-channel ints, PAM for alpha, PFM for floats
    (enc/pnm.cc)."""
    arr = np.asarray(arr)
    if arr.dtype in (np.float32, np.float64):
        a = arr.astype(np.float32)
        chan = 1 if a.ndim == 2 else a.shape[2]
        if chan not in (1, 3):
            raise CodecError("PFM: needs 1 or 3 channels")
        head = (b"Pf" if chan == 1 else b"PF") + \
            f"\n{a.shape[1]} {a.shape[0]}\n-1.0\n".encode()
        return head + a[::-1].astype("<f4").tobytes()
    if arr.dtype == np.uint8:
        maxval, dt = 255, "u1"
    elif arr.dtype == np.uint16:
        maxval, dt = 65535, ">u2"
    else:
        raise CodecError(f"PNM: unsupported dtype {arr.dtype}")
    h, w = arr.shape[:2]
    chan = 1 if arr.ndim == 2 else arr.shape[2]
    if chan in (2, 4) or force_pam:
        tt = {1: b"GRAYSCALE", 2: b"GRAYSCALE_ALPHA", 3: b"RGB",
              4: b"RGB_ALPHA"}[chan]
        head = (b"P7\nWIDTH %d\nHEIGHT %d\nDEPTH %d\nMAXVAL %d\n"
                b"TUPLTYPE %s\nENDHDR\n" % (w, h, chan, maxval, tt))
    elif chan == 1:
        head = b"P5\n%d %d\n%d\n" % (w, h, maxval)
    elif chan == 3:
        head = b"P6\n%d %d\n%d\n" % (w, h, maxval)
    else:
        raise CodecError(f"PNM: unsupported channel count {chan}")
    return head + arr.astype(dt).tobytes()


# ---------------------------------------------------------------------------
# PGX

_PGX_HEADER = re.compile(
    rb"PG (ML|LM) ([+-]) ?(\d+)[ \t\r\n](\d+)[ \t\r\n](\d+)\r?\n")


def decode_pgx(data: bytes) -> DecodedImage:
    """JPEG 2000 conformance grayscale (dec/pgx.cc)."""
    m = _PGX_HEADER.match(data)
    if not m:
        raise CodecError("PGX: bad header")
    endian, sign, bits_s, w_s, h_s = m.groups()
    bits, w, h = int(bits_s), int(w_s), int(h_s)
    if sign == b"-":
        raise CodecError("PGX: signed not supported")
    if not (0 < bits <= 16):
        raise CodecError("PGX: bits_per_sample invalid")
    dt = np.dtype((">u2" if endian == b"ML" else "<u2") if bits > 8
                  else "u1")
    need = w * h * dt.itemsize
    raw = data[m.end():]
    if len(raw) < need:
        raise CodecError("PGX: data too small")
    arr = np.frombuffer(raw[:need], dt).reshape(h, w)
    arr = arr.astype(np.uint16 if bits > 8 else np.uint8)
    return DecodedImage(arr, bits, codec="pgx")


def encode_pgx(arr: np.ndarray) -> bytes:
    """Big-endian PGX, 8/16-bit grayscale (enc/pgx.cc EncodeHeader)."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise CodecError("PGX: must be grayscale")
    if arr.dtype == np.uint8:
        bits, dt = 8, "u1"
    elif arr.dtype == np.uint16:
        bits, dt = 16, ">u2"
    else:
        raise CodecError("PGX: bits other than 8 or 16 not supported")
    head = b"PG ML + %d %d %d\n" % (bits, arr.shape[1], arr.shape[0])
    return head + arr.astype(dt).tobytes()


# ---------------------------------------------------------------------------
# EXR (self-contained subset: single-part scanline, NONE/ZIPS/ZIP)

_EXR_MAGIC = b"\x76\x2f\x31\x01"
_EXR_PT_SIZE = {0: 4, 1: 2, 2: 4}          # UINT, HALF, FLOAT
_EXR_PT_DT = {0: "<u4", 1: "<f2", 2: "<f4"}


def _exr_unpredict(buf: bytes) -> bytes:
    """Invert the ZIP post-deflate transform: delta-decode then
    re-interleave the two halves (OpenEXR ImfZip::uncompress)."""
    t = np.frombuffer(buf, np.uint8).astype(np.int64)
    if len(t) > 1:
        t = np.cumsum(np.concatenate([t[:1], t[1:] - 128])) & 0xFF
    t = t.astype(np.uint8)
    half = (len(t) + 1) // 2
    out = np.empty(len(t), np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


def _exr_predict(buf: bytes) -> bytes:
    """Forward ZIP transform: de-interleave into halves, then
    delta-encode (OpenEXR ImfZip::compress)."""
    raw = np.frombuffer(buf, np.uint8)
    t = np.concatenate([raw[0::2], raw[1::2]]).astype(np.int64)
    d = t.copy()
    d[1:] = t[1:] - t[:-1] + 128
    return (d & 0xFF).astype(np.uint8).tobytes()


def _read_exr_attrs(data: bytes, pos: int):
    attrs = {}
    while True:
        if data[pos] == 0:
            return attrs, pos + 1
        zi = data.index(b"\0", pos)
        name = data[pos:zi].decode("latin1")
        pos = zi + 1
        zi = data.index(b"\0", pos)
        typ = data[pos:zi].decode("latin1")
        pos = zi + 1
        size = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        attrs[name] = (typ, data[pos:pos + size])
        pos += size


def decode_exr(data: bytes) -> DecodedImage:
    """Minimal OpenEXR 2 scanline reader (dec/exr.cc semantics):
    single-part, compression NONE/ZIPS/ZIP, channels R,G,B[,A] or Y."""
    if data[:4] != _EXR_MAGIC:
        raise CodecError("EXR: bad magic")
    version = struct.unpack_from("<i", data, 4)[0]
    if version & 0x200 or version & 0x1000:
        raise CodecError("EXR: tiled/multi-part files not supported")
    attrs, pos = _read_exr_attrs(data, 8)
    try:
        ch_raw = attrs["channels"][1]
        comp = attrs["compression"][1][0]
        dw = struct.unpack("<4i", attrs["dataWindow"][1])
    except KeyError as e:
        raise CodecError(f"EXR: missing required attribute {e}")
    w = dw[2] - dw[0] + 1
    h = dw[3] - dw[1] + 1
    if w <= 0 or h <= 0 or w * h > (1 << 30):
        raise CodecError("EXR: bad dataWindow")
    # channel list
    chans = []
    cpos = 0
    while ch_raw[cpos] != 0:
        zi = ch_raw.index(b"\0", cpos)
        cname = ch_raw[cpos:zi].decode("latin1")
        ptype, _plin, xs, ys = struct.unpack_from("<iIii", ch_raw, zi + 1)
        if ptype not in _EXR_PT_SIZE:
            raise CodecError("EXR: bad pixel type")
        if xs != 1 or ys != 1:
            raise CodecError("EXR: subsampled channels not supported")
        chans.append((cname, ptype))
        cpos = zi + 17
    if comp not in (0, 2, 3):
        raise CodecError(f"EXR: compression {comp} not supported "
                         "(NONE/ZIPS/ZIP only)")
    lines_per_block = {0: 1, 2: 1, 3: 16}[comp]
    nblocks = -(-h // lines_per_block)
    offsets = struct.unpack_from(f"<{nblocks}q", data, pos)
    row_bytes = sum(w * _EXR_PT_SIZE[pt] for _, pt in chans)
    planes = {name: np.zeros((h, w), np.float32) for name, _ in chans}
    for off in offsets:
        y, nb = struct.unpack_from("<ii", data, off)
        raw = data[off + 8:off + 8 + nb]
        rows = min(lines_per_block, dw[3] - y + 1)
        expect = row_bytes * rows
        if comp in (2, 3) and nb < expect:
            raw = _exr_unpredict(zlib.decompress(raw))
        if len(raw) < expect:
            raise CodecError("EXR: truncated chunk")
        rp = 0
        for r_i in range(rows):
            for cname, pt in chans:
                cb = w * _EXR_PT_SIZE[pt]
                vals = np.frombuffer(raw[rp:rp + cb], _EXR_PT_DT[pt])
                planes[cname][y - dw[1] + r_i] = vals.astype(np.float32)
                rp += cb
    names = [c for c, _ in chans]
    if all(k in names for k in "RGB"):
        order = ["R", "G", "B"] + (["A"] if "A" in names else [])
        arr = np.stack([planes[k] for k in order], axis=-1)
    elif "Y" in names:
        arr = planes["Y"]
    else:
        arr = np.stack([planes[k] for k in names], axis=-1)
    half = all(pt == 1 for _, pt in chans)
    return DecodedImage(arr, 16 if half else 32, float_samples=True,
                        codec="exr")


def _exr_attr(name: str, typ: str, payload: bytes) -> bytes:
    return name.encode() + b"\0" + typ.encode() + b"\0" + \
        struct.pack("<i", len(payload)) + payload


def encode_exr(arr: np.ndarray) -> bytes:
    """Half-float RGB(A) (or gray Y) scanline EXR with ZIP-16
    compression — the reference writer's RgbaOutputFile defaults
    (enc/exr.cc)."""
    a = np.asarray(arr, np.float32)
    if a.ndim == 2:
        chans = [("Y", a)]
    elif a.shape[2] == 3:
        chans = [("B", a[:, :, 2]), ("G", a[:, :, 1]), ("R", a[:, :, 0])]
    elif a.shape[2] == 4:
        chans = [("A", a[:, :, 3]), ("B", a[:, :, 2]),
                 ("G", a[:, :, 1]), ("R", a[:, :, 0])]
    else:
        raise CodecError("EXR: needs 1, 3 or 4 channels")
    h, w = a.shape[:2]
    ch_payload = b"".join(
        n.encode() + b"\0" + struct.pack("<iIii", 1, 0, 1, 1)
        for n, _ in chans) + b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        _exr_attr("channels", "chlist", ch_payload)
        + _exr_attr("compression", "compression", b"\x03")
        + _exr_attr("dataWindow", "box2i", box)
        + _exr_attr("displayWindow", "box2i", box)
        + _exr_attr("lineOrder", "lineOrder", b"\x00")
        + _exr_attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + _exr_attr("screenWindowCenter", "v2f",
                    struct.pack("<2f", 0.0, 0.0))
        + _exr_attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0")
    nblocks = -(-h // 16)
    chunks = []
    for b in range(nblocks):
        y0 = b * 16
        rows = min(16, h - y0)
        raw = b"".join(
            plane[y0 + r].astype("<f2").tobytes()
            for r in range(rows) for _, plane in chans)
        comp = zlib.compress(_exr_predict(raw))
        if len(comp) >= len(raw):
            comp = raw
        chunks.append(struct.pack("<ii", y0, len(comp)) + comp)
    out = [_EXR_MAGIC, struct.pack("<i", 2), header]
    base = 8 + len(header) + 8 * nblocks
    for c in chunks:
        out.append(struct.pack("<q", base))
        base += len(c)
    out.extend(chunks)
    return b"".join(out)


# ---------------------------------------------------------------------------
# Minimal PNG writer for 16-bit RGB(A) (PIL writes only 1-channel 16-bit)

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    raw = tag + payload
    return struct.pack(">I", len(payload)) + raw + \
        struct.pack(">I", zlib.crc32(raw))


def _encode_png16(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    chan = arr.shape[2]
    color_type = {3: 2, 4: 6}[chan]
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, 0)
    rows = arr.astype(">u2").tobytes()
    stride = w * chan * 2
    filt = b"".join(b"\x00" + rows[y * stride:(y + 1) * stride]
                    for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(filt, 6))
            + _png_chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# PIL-backed formats + JXL + facade

def _decode_pil(data: bytes, codec: str) -> DecodedImage:
    from PIL import Image
    im = Image.open(io.BytesIO(data))
    icc = im.info.get("icc_profile")
    frames, durations = [], []
    n_frames = getattr(im, "n_frames", 1)
    for i in range(n_frames):
        if n_frames > 1:
            im.seek(i)
            durations.append(im.info.get("duration", 100) / 1000.0)
        fr = im
        if fr.mode == "P":
            fr = fr.convert("RGBA" if "transparency" in im.info else "RGB")
        elif fr.mode not in ("L", "LA", "RGB", "RGBA", "I;16", "I"):
            fr = fr.convert("RGB")
        arr = np.asarray(fr)
        if arr.dtype == np.int32:
            arr = np.clip(arr, 0, 65535).astype(np.uint16)
        frames.append(arr)
    arr = frames[0]
    bits = 16 if arr.dtype == np.uint16 else 8
    img = DecodedImage(arr, bits, codec=codec,
                       icc=bytes(icc) if icc else None)
    if n_frames > 1:
        img.frames = frames
        img.frame_durations = durations
    return img


def _decode_jxl(data: bytes) -> DecodedImage:
    from libjxl_tpu import api
    res = api.decode(data)
    px = res.pixels
    bits = 16 if px.dtype == np.uint16 else \
        (32 if px.dtype == np.float32 else 8)
    return DecodedImage(np.asarray(px), bits,
                        float_samples=px.dtype == np.float32,
                        codec="jxl", icc=getattr(res, "icc", None))


def decode_bytes(data: bytes, codec: str | None = None) -> DecodedImage:
    """Sniff + decode (dec/decode.cc DecodeBytes)."""
    codec = codec or detect_codec(data)
    if codec == "pnm":
        return decode_pnm(data)
    if codec == "pgx":
        return decode_pgx(data)
    if codec == "exr":
        return decode_exr(data)
    if codec == "jxl":
        return _decode_jxl(data)
    if codec in _PIL_CODECS:
        return _decode_pil(data, codec)
    raise CodecError(f"no decoder for codec {codec!r}")


def encode_to_bytes(arr: np.ndarray, codec: str) -> bytes:
    """Encode an array with an explicit codec (enc/encode.cc)."""
    arr = np.asarray(arr)
    if codec == "pnm":
        return encode_pnm(arr)
    if codec == "pgx":
        return encode_pgx(arr)
    if codec == "exr":
        return encode_exr(arr)
    if codec in _PIL_CODECS:
        from PIL import Image
        if arr.dtype == np.uint16 and codec == "png":
            if arr.ndim == 3:
                # PIL writes single-channel 16-bit only.
                return _encode_png16(arr)
            im = Image.fromarray(arr, mode="I;16")
        else:
            im = Image.fromarray(arr)
        buf = io.BytesIO()
        im.save(buf, format={"jpg": "JPEG"}.get(codec, codec.upper()))
        return buf.getvalue()
    if codec == "jxl":
        from libjxl_tpu import api
        return api.encode(arr)
    raise CodecError(f"no encoder for codec {codec!r}")


def load_image(path: str) -> DecodedImage:
    """Decode a file, trusting content sniffing over the extension."""
    with open(path, "rb") as f:
        data = f.read()
    codec = detect_codec(data)
    if codec == "unknown":
        codec = codec_from_path(path)
    return decode_bytes(data, codec)


def save_image(arr: np.ndarray, path: str) -> None:
    """Encode by file extension (enc/encode.cc Encoder::FromExtension)."""
    codec = codec_from_path(path)
    if codec == "unknown":
        raise CodecError(f"cannot infer codec from path {path!r}")
    data = encode_to_bytes(arr, codec)
    with open(path, "wb") as f:
        f.write(data)
