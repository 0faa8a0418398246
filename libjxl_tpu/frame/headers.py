"""Codestream-level headers: SizeHeader, ImageMetadata, CodecMetadata.

Reference: lib/jxl/headers.{h,cc}, image_metadata.{h,cc}. Field layouts
mirror the VisitFields implementations exactly (cited per bundle).
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import (
    Bits, BitsOffset, U32Enc, Val, Visitor, ReadVisitor, WriteVisitor,
    bundle_all_default, bundle_read, bundle_write,
)
from libjxl_tpu.color.color_encoding import ColorEncoding
from libjxl_tpu.color.constants import (
    DEFAULT_INTENSITY_TARGET, DEFAULT_INVERSE_OPSIN_MATRIX,
    DEFAULT_QUANT_BIAS, OPSIN_ABSORBANCE_BIAS,
)
from libjxl_tpu.pipeline.upsample_weights import (
    UPSAMPLING2_WEIGHTS, UPSAMPLING4_WEIGHTS, UPSAMPLING8_WEIGHTS,
)

# Aspect ratio table (headers.cc:35-46)
_ASPECT_RATIOS = [(1, 1), (12, 10), (4, 3), (3, 2), (16, 9), (5, 4), (2, 1)]


def _find_aspect_ratio(xsize: int, ysize: int) -> int:
    for r, (num, den) in enumerate(_ASPECT_RATIOS, start=1):
        if xsize == (ysize * num) // den:
            return r
    return 0


def visit_name_string(v: Visitor, name: str) -> str:
    """frame_header.h:35-50."""
    data = name.encode("utf-8")
    enc = U32Enc(Val(0), Bits(4), BitsOffset(5, 16), BitsOffset(10, 48))
    length = v.u32(enc, 0, len(data))
    if v.reading:
        out = bytearray(length)
        for i in range(length):
            out[i] = v.bits(8, 0, 0)
        return out.decode("utf-8", errors="replace")
    for b in data:
        v.bits(8, 0, b)
    return name


@dataclasses.dataclass
class SizeHeader:
    """headers.cc:129-153."""
    small: bool = False
    ysize_div8_minus_1: int = 0
    ysize_raw: int = 1
    ratio: int = 0
    xsize_div8_minus_1: int = 0
    xsize_raw: int = 1

    _SIZE_ENC = U32Enc(BitsOffset(9, 1), BitsOffset(13, 1), BitsOffset(18, 1),
                       BitsOffset(30, 1))

    def visit_fields(self, v: Visitor) -> None:
        self.small = v.bool_(False, self.small)
        if v.conditional(self.small):
            self.ysize_div8_minus_1 = v.bits(5, 0, self.ysize_div8_minus_1)
        if v.conditional(not self.small):
            self.ysize_raw = v.u32(self._SIZE_ENC, 1, self.ysize_raw)
        self.ratio = v.bits(3, 0, self.ratio)
        if v.conditional(self.ratio == 0 and self.small):
            self.xsize_div8_minus_1 = v.bits(5, 0, self.xsize_div8_minus_1)
        if v.conditional(self.ratio == 0 and not self.small):
            self.xsize_raw = v.u32(self._SIZE_ENC, 1, self.xsize_raw)

    @property
    def ysize(self) -> int:
        return (self.ysize_div8_minus_1 + 1) * 8 if self.small \
            else self.ysize_raw

    @property
    def xsize(self) -> int:
        if self.ratio != 0:
            num, den = _ASPECT_RATIOS[self.ratio - 1]
            return (self.ysize * num) // den
        return (self.xsize_div8_minus_1 + 1) * 8 if self.small \
            else self.xsize_raw

    def set(self, xsize: int, ysize: int) -> None:
        """headers.cc:67-94."""
        if xsize == 0 or ysize == 0 or max(xsize, ysize) >= (1 << 32):
            raise BitstreamError("invalid image size")
        self.ratio = _find_aspect_ratio(xsize, ysize)
        self.small = (ysize <= 256 and ysize % 8 == 0
                      and (self.ratio != 0 or (xsize <= 256 and xsize % 8 == 0)))
        if self.small:
            self.ysize_div8_minus_1 = ysize // 8 - 1
        else:
            self.ysize_raw = ysize
        if self.ratio == 0:
            if self.small:
                self.xsize_div8_minus_1 = xsize // 8 - 1
            else:
                self.xsize_raw = xsize
        assert self.xsize == xsize and self.ysize == ysize


@dataclasses.dataclass
class PreviewHeader:
    """headers.cc:156-181."""
    div8: bool = False
    ysize_div8: int = 1
    ysize_raw: int = 1
    ratio: int = 0
    xsize_div8: int = 1
    xsize_raw: int = 1

    _DIV8_ENC = U32Enc(Val(16), Val(32), BitsOffset(5, 1), BitsOffset(9, 33))
    _RAW_ENC = U32Enc(BitsOffset(6, 1), BitsOffset(8, 65), BitsOffset(10, 321),
                      BitsOffset(12, 1345))

    def visit_fields(self, v: Visitor) -> None:
        self.div8 = v.bool_(False, self.div8)
        if v.conditional(self.div8):
            self.ysize_div8 = v.u32(self._DIV8_ENC, 1, self.ysize_div8)
        if v.conditional(not self.div8):
            self.ysize_raw = v.u32(self._RAW_ENC, 1, self.ysize_raw)
        self.ratio = v.bits(3, 0, self.ratio)
        if v.conditional(self.ratio == 0 and self.div8):
            self.xsize_div8 = v.u32(self._DIV8_ENC, 1, self.xsize_div8)
        if v.conditional(self.ratio == 0 and not self.div8):
            self.xsize_raw = v.u32(self._RAW_ENC, 1, self.xsize_raw)

    @property
    def ysize(self) -> int:
        return self.ysize_div8 * 8 if self.div8 else self.ysize_raw

    @property
    def xsize(self) -> int:
        if self.ratio != 0:
            num, den = _ASPECT_RATIOS[self.ratio - 1]
            return (self.ysize * num) // den
        return self.xsize_div8 * 8 if self.div8 else self.xsize_raw


@dataclasses.dataclass
class AnimationHeader:
    """headers.cc:184-196."""
    tps_numerator: int = 1
    tps_denominator: int = 1
    num_loops: int = 0
    have_timecodes: bool = False

    def visit_fields(self, v: Visitor) -> None:
        self.tps_numerator = v.u32(
            U32Enc(Val(100), Val(1000), BitsOffset(10, 1), BitsOffset(30, 1)),
            1, self.tps_numerator)
        self.tps_denominator = v.u32(
            U32Enc(Val(1), Val(1001), BitsOffset(8, 1), BitsOffset(10, 1)),
            1, self.tps_denominator)
        self.num_loops = v.u32(
            U32Enc(Val(0), Bits(3), Bits(16), Bits(32)), 0, self.num_loops)
        self.have_timecodes = v.bool_(False, self.have_timecodes)


@dataclasses.dataclass
class BitDepth:
    """image_metadata.cc:26-65."""
    floating_point_sample: bool = False
    bits_per_sample: int = 8
    exponent_bits_per_sample: int = 0

    def visit_fields(self, v: Visitor) -> None:
        self.floating_point_sample = v.bool_(False, self.floating_point_sample)
        if not self.floating_point_sample:
            self.bits_per_sample = v.u32(
                U32Enc(Val(8), Val(10), Val(12), BitsOffset(6, 1)),
                8, self.bits_per_sample)
            self.exponent_bits_per_sample = 0
            if self.bits_per_sample > 31:
                raise BitstreamError("bits_per_sample too large")
        else:
            self.bits_per_sample = v.u32(
                U32Enc(Val(32), Val(16), Val(24), BitsOffset(6, 1)),
                32, self.bits_per_sample)
            self.exponent_bits_per_sample = v.bits(
                4, 7, self.exponent_bits_per_sample - 1) + 1
            if not (2 <= self.exponent_bits_per_sample <= 8):
                raise BitstreamError("invalid exponent bits")
            mant = self.bits_per_sample - self.exponent_bits_per_sample - 1
            if not (2 <= mant <= 23):
                raise BitstreamError("invalid mantissa bits")

    @staticmethod
    def uint(bits: int) -> "BitDepth":
        return BitDepth(False, bits, 0)

    @staticmethod
    def f32() -> "BitDepth":
        return BitDepth(True, 32, 8)

    @staticmethod
    def f16() -> "BitDepth":
        return BitDepth(True, 16, 5)


class ExtraChannelType(enum.IntEnum):
    ALPHA = 0
    DEPTH = 1
    SPOT_COLOR = 2
    SELECTION_MASK = 3
    BLACK = 4
    CFA = 5
    THERMAL = 6
    UNKNOWN = 15
    OPTIONAL = 16


@dataclasses.dataclass
class ExtraChannelInfo:
    """image_metadata.cc:221-266."""
    all_default: bool = True
    type: int = ExtraChannelType.ALPHA
    bit_depth: BitDepth = dataclasses.field(default_factory=BitDepth)
    dim_shift: int = 0
    name: str = ""
    alpha_associated: bool = False
    spot_color: tuple = (0.0, 0.0, 0.0, 0.0)
    cfa_channel: int = 1

    def visit_fields(self, v: Visitor) -> None:
        if v.all_default(self):
            return
        self.type = v.enum(ExtraChannelType.ALPHA, self.type)
        v.visit_nested(self.bit_depth)
        self.dim_shift = v.u32(
            U32Enc(Val(0), Val(3), Val(4), BitsOffset(3, 1)), 0,
            self.dim_shift)
        if (1 << self.dim_shift) > 8:
            raise BitstreamError("dim_shift too large")
        self.name = visit_name_string(v, self.name)
        if v.conditional(self.type == ExtraChannelType.ALPHA):
            self.alpha_associated = v.bool_(False, self.alpha_associated)
        if v.conditional(self.type == ExtraChannelType.SPOT_COLOR):
            self.spot_color = tuple(
                v.f16(0.0, c) for c in self.spot_color)
        if v.conditional(self.type == ExtraChannelType.CFA):
            self.cfa_channel = v.u32(
                U32Enc(Val(1), Bits(2), BitsOffset(4, 3), BitsOffset(8, 19)),
                1, self.cfa_channel)


@dataclasses.dataclass
class ToneMapping:
    """image_metadata.cc:385-414."""
    all_default: bool = True
    intensity_target: float = DEFAULT_INTENSITY_TARGET
    min_nits: float = 0.0
    relative_to_max_display: bool = False
    linear_below: float = 0.0

    def visit_fields(self, v: Visitor) -> None:
        if v.all_default(self):
            return
        self.intensity_target = v.f16(DEFAULT_INTENSITY_TARGET,
                                      self.intensity_target)
        if self.intensity_target <= 0:
            raise BitstreamError("invalid intensity target")
        self.min_nits = v.f16(0.0, self.min_nits)
        if self.min_nits < 0 or self.min_nits > self.intensity_target:
            raise BitstreamError("invalid min_nits")
        self.relative_to_max_display = v.bool_(
            False, self.relative_to_max_display)
        self.linear_below = v.f16(0.0, self.linear_below)
        if self.linear_below < 0 or (self.relative_to_max_display
                                     and self.linear_below > 1.0):
            raise BitstreamError("invalid linear_below")


@dataclasses.dataclass
class OpsinInverseMatrix:
    """image_metadata.cc:359-382."""
    all_default: bool = True
    inverse_matrix: np.ndarray = dataclasses.field(
        default_factory=lambda: DEFAULT_INVERSE_OPSIN_MATRIX.copy())
    opsin_biases: np.ndarray = dataclasses.field(
        default_factory=lambda: -OPSIN_ABSORBANCE_BIAS.copy())
    quant_biases: np.ndarray = dataclasses.field(
        default_factory=lambda: DEFAULT_QUANT_BIAS.copy())

    def visit_fields(self, v: Visitor) -> None:
        if v.all_default(self):
            return
        for j in range(3):
            for i in range(3):
                self.inverse_matrix[j][i] = v.f16(
                    float(DEFAULT_INVERSE_OPSIN_MATRIX[j][i]),
                    float(self.inverse_matrix[j][i]))
        for i in range(3):
            self.opsin_biases[i] = v.f16(float(-OPSIN_ABSORBANCE_BIAS[i]),
                                         float(self.opsin_biases[i]))
        for i in range(4):
            self.quant_biases[i] = v.f16(float(DEFAULT_QUANT_BIAS[i]),
                                         float(self.quant_biases[i]))


@dataclasses.dataclass
class CustomTransformData:
    """image_metadata.cc:78-218 (upsampling weights + opsin override)."""
    all_default: bool = True
    nonserialized_xyb_encoded: bool = False
    opsin_inverse_matrix: OpsinInverseMatrix = dataclasses.field(
        default_factory=OpsinInverseMatrix)
    custom_weights_mask: int = 0
    upsampling2_weights: np.ndarray = dataclasses.field(
        default_factory=lambda: UPSAMPLING2_WEIGHTS.copy())
    upsampling4_weights: np.ndarray = dataclasses.field(
        default_factory=lambda: UPSAMPLING4_WEIGHTS.copy())
    upsampling8_weights: np.ndarray = dataclasses.field(
        default_factory=lambda: UPSAMPLING8_WEIGHTS.copy())

    def visit_fields(self, v: Visitor) -> None:
        if v.all_default(self):
            return
        if v.conditional(self.nonserialized_xyb_encoded):
            v.visit_nested(self.opsin_inverse_matrix)
        self.custom_weights_mask = v.bits(3, 0, self.custom_weights_mask)
        if v.conditional((self.custom_weights_mask & 1) != 0):
            for i in range(15):
                self.upsampling2_weights[i] = v.f16(
                    float(UPSAMPLING2_WEIGHTS[i]),
                    float(self.upsampling2_weights[i]))
        if v.conditional((self.custom_weights_mask & 2) != 0):
            for i in range(55):
                self.upsampling4_weights[i] = v.f16(
                    float(UPSAMPLING4_WEIGHTS[i]),
                    float(self.upsampling4_weights[i]))
        if v.conditional((self.custom_weights_mask & 4) != 0):
            for i in range(210):
                self.upsampling8_weights[i] = v.f16(
                    float(UPSAMPLING8_WEIGHTS[i]),
                    float(self.upsampling8_weights[i]))


@dataclasses.dataclass
class ImageMetadata:
    """image_metadata.cc:283-357."""
    all_default: bool = True
    orientation: int = 1
    have_intrinsic_size: bool = False
    intrinsic_size: SizeHeader = dataclasses.field(default_factory=SizeHeader)
    have_preview: bool = False
    preview_size: PreviewHeader = dataclasses.field(
        default_factory=PreviewHeader)
    have_animation: bool = False
    animation: AnimationHeader = dataclasses.field(
        default_factory=AnimationHeader)
    bit_depth: BitDepth = dataclasses.field(default_factory=BitDepth)
    modular_16_bit_buffer_sufficient: bool = True
    extra_channel_info: list = dataclasses.field(default_factory=list)
    xyb_encoded: bool = True
    color_encoding: ColorEncoding = dataclasses.field(
        default_factory=ColorEncoding)
    tone_mapping: ToneMapping = dataclasses.field(default_factory=ToneMapping)
    extensions: int = 0

    @property
    def num_extra_channels(self) -> int:
        return len(self.extra_channel_info)

    def find_extra_channel(self, ec_type: int):
        for eci in self.extra_channel_info:
            if eci.type == ec_type:
                return eci
        return None

    @property
    def has_alpha(self) -> bool:
        return self.find_extra_channel(ExtraChannelType.ALPHA) is not None

    def set_alpha_bits(self, bits: int, premultiplied: bool = False) -> None:
        self.extra_channel_info = [
            e for e in self.extra_channel_info
            if e.type != ExtraChannelType.ALPHA]
        if bits > 0:
            eci = ExtraChannelInfo(all_default=False,
                                   type=ExtraChannelType.ALPHA,
                                   bit_depth=BitDepth.uint(bits),
                                   alpha_associated=premultiplied)
            self.extra_channel_info.insert(0, eci)

    def visit_fields(self, v: Visitor) -> None:
        if v.all_default(self):
            return
        if v.reading:
            extra_fields = False
        else:
            extra_fields = (self.orientation != 1 or self.have_preview
                            or self.have_animation or self.have_intrinsic_size
                            or not bundle_all_default(self.tone_mapping))
        extra_fields = v.bool_(False, extra_fields)
        if v.conditional(extra_fields):
            self.orientation = v.bits(3, 0, self.orientation - 1) + 1
            self.have_intrinsic_size = v.bool_(False, self.have_intrinsic_size)
            if v.conditional(self.have_intrinsic_size):
                v.visit_nested(self.intrinsic_size)
            self.have_preview = v.bool_(False, self.have_preview)
            if v.conditional(self.have_preview):
                v.visit_nested(self.preview_size)
            self.have_animation = v.bool_(False, self.have_animation)
            if v.conditional(self.have_animation):
                v.visit_nested(self.animation)
        else:
            self.orientation = 1
            self.have_intrinsic_size = False
            self.have_preview = False
            self.have_animation = False
        v.visit_nested(self.bit_depth)
        self.modular_16_bit_buffer_sufficient = v.bool_(
            True, self.modular_16_bit_buffer_sufficient)
        num_ec = v.u32(U32Enc(Val(0), Val(1), BitsOffset(4, 2),
                              BitsOffset(12, 1)), 0, self.num_extra_channels)
        if v.reading:
            self.extra_channel_info = [ExtraChannelInfo()
                                       for _ in range(num_ec)]
        if v.conditional(num_ec != 0):
            for eci in self.extra_channel_info:
                v.visit_nested(eci)
        self.xyb_encoded = v.bool_(True, self.xyb_encoded)
        v.visit_nested(self.color_encoding)
        if v.conditional(extra_fields):
            v.visit_nested(self.tone_mapping)
        self.extensions = v.begin_extensions(self.extensions)
        v.end_extensions()


@dataclasses.dataclass
class CodecMetadata:
    """image_metadata.h:382 — size + metadata + transform data."""
    size: SizeHeader = dataclasses.field(default_factory=SizeHeader)
    m: ImageMetadata = dataclasses.field(default_factory=ImageMetadata)
    transform_data: CustomTransformData = dataclasses.field(
        default_factory=CustomTransformData)
    icc_profile: bytes | None = None   # decoded/attached ICC payload

    @property
    def xsize(self) -> int:
        return self.size.xsize

    @property
    def ysize(self) -> int:
        return self.size.ysize

    def oriented_size(self, keep_orientation: bool = False) -> tuple[int, int]:
        if self.m.orientation > 4 and not keep_orientation:
            return self.ysize, self.xsize
        return self.xsize, self.ysize


# Codestream signature (decode.cc JxlSignatureCheck): 0xFF 0x0A
CODESTREAM_SIGNATURE = b"\xff\x0a"


def read_codestream_headers(r: BitReader) -> CodecMetadata:
    """Signature + SizeHeader + ImageMetadata + CustomTransformData
    (decode.cc ReadBasicInfo/ReadAllHeaders order)."""
    sig = bytes([r.read(8), r.read(8)])
    if sig != CODESTREAM_SIGNATURE:
        raise BitstreamError(f"bad signature {sig.hex()}")
    meta = CodecMetadata()
    bundle_read(r, meta.size)
    bundle_read(r, meta.m)
    meta.transform_data.nonserialized_xyb_encoded = meta.m.xyb_encoded
    bundle_read(r, meta.transform_data)
    if meta.m.color_encoding.want_icc:
        from libjxl_tpu.color.icc_codec import read_icc
        meta.icc_profile = read_icc(r)
    # Frames begin at a byte boundary after all codestream headers
    # (reference decode.cc:1133 JumpToByteBoundary).
    r.align_to_byte()
    return meta


def write_codestream_headers(meta: CodecMetadata, w: BitWriter) -> None:
    w.write(8, CODESTREAM_SIGNATURE[0])
    w.write(8, CODESTREAM_SIGNATURE[1])
    bundle_write(meta.size, w)
    bundle_write(meta.m, w)
    meta.transform_data.nonserialized_xyb_encoded = meta.m.xyb_encoded
    bundle_write(meta.transform_data, w)
    if meta.m.color_encoding.want_icc:
        from libjxl_tpu.color.icc_codec import write_icc
        if meta.icc_profile is None:
            raise ValueError("want_icc set but no ICC profile provided")
        write_icc(meta.icc_profile, w)
    # Zero-pad so the first frame starts byte-aligned (spec requirement;
    # reference decode.cc:1133).
    w.align_to_byte()
