"""One-shot encode/decode convenience API.

encode(): (H, W, 3) or (H, W) arrays -> .jxl codestream bytes.
decode(): codestream bytes -> pixels + metadata.

Reference analogue: lib/extras/enc/jxl.cc EncodeImageJXL /
lib/extras/dec/jxl.cc DecodeImageJXL driving the C API.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.color.color_encoding import ColorEncoding
from libjxl_tpu.container.boxes import is_container, pack_container, \
    unpack_container
from libjxl_tpu.color.xyb import (
    linear_rgb_to_xyb, linear_to_srgb, srgb_to_linear, xyb_to_linear_rgb,
)
from libjxl_tpu.frame.decode_frame import decode_frame
from libjxl_tpu.frame.encode_frame import (
    encode_modular_frame, encode_vardct_frame,
)
from libjxl_tpu.frame.headers import (
    BitDepth, CodecMetadata, read_codestream_headers, write_codestream_headers,
)


@dataclasses.dataclass
class DecodeResult:
    pixels: np.ndarray     # (H, W, C) uint8/uint16 or float32
    metadata: CodecMetadata
    lossless: bool


def encode(image: np.ndarray, *, distance: float = 1.0,
           lossless: bool = False, container: bool = False,
           progressive: bool = False, noise: float | None = None) -> bytes:
    """Encode an sRGB image array to a JPEG XL codestream.

    image: (H, W, 3) or (H, W); uint8, uint16 or float in [0, 1].
    distance: butteraugli target for the lossy path (0 => lossless).
    """
    if distance == 0:
        lossless = True
    if image.ndim == 2:
        image = image[:, :, None]
    h, w, nchan = image.shape
    has_alpha = nchan in (2, 4)
    if image.dtype == np.uint8:
        bits = 8
        scale = 255.0
    elif image.dtype == np.uint16:
        bits = 16
        scale = 65535.0
    else:
        bits = 8 if not lossless else 16
        scale = 1.0

    meta = CodecMetadata()
    meta.size.set(w, h)
    meta.m.bit_depth = BitDepth.uint(bits)
    if has_alpha:
        meta.m.set_alpha_bits(bits)

    writer = BitWriter()
    if lossless:
        meta.m.xyb_encoded = False
        meta.m.color_encoding = ColorEncoding.srgb(
            is_gray=(nchan - (1 if has_alpha else 0)) == 1)
        if image.dtype not in (np.uint8, np.uint16):
            raise ValueError("lossless encode expects integer samples")
        write_codestream_headers(meta, writer)
        ncolor = nchan - 1 if has_alpha else nchan
        channels = [image[:, :, c].astype(np.int32) for c in range(ncolor)]
        if has_alpha:
            channels.append(image[:, :, -1].astype(np.int32))
        from libjxl_tpu.modular.codec import Transform, TransformId
        transforms = []
        if len(channels) >= 3:
            transforms = [Transform(id=TransformId.RCT, begin_c=0,
                                    rct_type=6)]
        encode_modular_frame(channels, meta, writer, transforms=transforms)
    else:
        meta.m.xyb_encoded = True
        write_codestream_headers(meta, writer)
        ncolor = nchan - 1 if has_alpha else nchan
        srgb = image[:, :, :min(ncolor, 3)].astype(np.float32) / scale
        if ncolor == 1:
            srgb = np.repeat(srgb, 3, axis=2)
        linear = srgb_to_linear(srgb).transpose(2, 0, 1)
        xyb = linear_rgb_to_xyb(linear)
        extra = [image[:, :, -1].astype(np.int32)] if has_alpha else None
        encode_vardct_frame(xyb, meta, writer, distance=distance,
                            extra_channels=extra,
                            pass_shifts=[2, 0] if progressive else None,
                            noise=noise)
    writer.align_to_byte()
    data = writer.get_bytes()
    return pack_container(data) if container else data


def decode(data: bytes) -> DecodeResult:
    if is_container(data):
        data = unpack_container(data).codestream
    r = BitReader(data)
    meta = read_codestream_headers(r)
    if meta.m.color_encoding.want_icc:
        raise BitstreamError("ICC codestreams not supported yet")
    # Frames start immediately (bit-unaligned); the TOC aligns internally.
    frame = decode_frame(r, meta)

    bits = meta.m.bit_depth.bits_per_sample
    dtype = np.uint8 if bits <= 8 else np.uint16
    maxval = (1 << bits) - 1
    if frame.modular_channels is not None:
        arr = np.stack(frame.modular_channels, axis=-1)
        arr = np.clip(arr, 0, maxval).astype(dtype)
        return DecodeResult(pixels=arr, metadata=meta, lossless=True)

    linear = xyb_to_linear_rgb(frame.xyb)
    srgb = linear_to_srgb(linear)
    arr = np.clip(np.round(srgb * maxval), 0, maxval).astype(dtype)
    arr = arr.transpose(1, 2, 0)
    if frame.extra_channels:
        alpha = np.clip(frame.extra_channels[0], 0, maxval
                        ).astype(dtype)[:, :, None]
        arr = np.concatenate([arr, alpha], axis=-1)
    return DecodeResult(pixels=arr, metadata=meta, lossless=False)
