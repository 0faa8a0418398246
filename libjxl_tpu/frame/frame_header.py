"""FrameHeader and sub-bundles (blending, passes, loop filter).

Reference: lib/jxl/frame_header.{h,cc}, loop_filter.{h,cc}. Field order
matches FrameHeader::VisitFields (frame_header.cc:215-439).
"""

from __future__ import annotations

import dataclasses
import enum

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.base.frame_dimensions import FrameDimensions
from libjxl_tpu.base.rect import div_ceil
from libjxl_tpu.base.signed import pack_signed, unpack_signed
from libjxl_tpu.bitstream.fields import (
    Bits, BitsOffset, U32Enc, Val, Visitor,
)
from libjxl_tpu.frame.headers import CodecMetadata, visit_name_string

MAX_NUM_PASSES = 11          # common.h:37
MAX_NUM_REFERENCE_FRAMES = 4  # common.h:40
EPF_SHARP_ENTRIES = 8


class FrameEncoding(enum.IntEnum):
    VARDCT = 0
    MODULAR = 1


class FrameType(enum.IntEnum):
    REGULAR = 0
    DC_FRAME = 1
    REFERENCE_ONLY = 2
    SKIP_PROGRESSIVE = 3


class ColorTransform(enum.IntEnum):
    XYB = 0
    NONE = 1
    YCBCR = 2


class BlendMode(enum.IntEnum):
    REPLACE = 0
    ADD = 1
    BLEND = 2
    ALPHA_WEIGHTED_ADD = 3
    MUL = 4


class FrameFlags(enum.IntFlag):
    NOISE = 1
    PATCHES = 2
    SPLINES = 16
    USE_DC_FRAME = 32
    SKIP_ADAPTIVE_DC_SMOOTHING = 128


@dataclasses.dataclass
class BlendingInfo:
    """frame_header.cc:66-95."""
    mode: int = BlendMode.REPLACE
    alpha_channel: int = 0
    clamp: bool = False
    source: int = 0
    nonserialized_num_extra_channels: int = 0
    nonserialized_is_partial_frame: bool = False

    def visit_fields(self, v: Visitor) -> None:
        self.mode = v.u32(U32Enc(Val(0), Val(1), Val(2), BitsOffset(2, 3)),
                          BlendMode.REPLACE, self.mode)
        if self.mode > BlendMode.MUL:
            raise BitstreamError("invalid blend mode")
        uses_alpha = (self.nonserialized_num_extra_channels > 0
                      and self.mode in (BlendMode.BLEND,
                                        BlendMode.ALPHA_WEIGHTED_ADD))
        if v.conditional(uses_alpha):
            self.alpha_channel = v.u32(
                U32Enc(Val(0), Val(1), Val(2), BitsOffset(3, 3)), 0,
                self.alpha_channel)
            if v.reading and self.alpha_channel >= \
                    self.nonserialized_num_extra_channels:
                raise BitstreamError("invalid alpha channel for blending")
        if v.conditional(uses_alpha or self.mode == BlendMode.MUL):
            self.clamp = v.bool_(False, self.clamp)
        if v.conditional(self.mode != BlendMode.REPLACE
                         or self.nonserialized_is_partial_frame):
            self.source = v.u32(U32Enc(Val(0), Val(1), Val(2), Val(3)), 0,
                                self.source)


@dataclasses.dataclass
class AnimationFrame:
    """frame_header.cc:120-133."""
    duration: int = 0
    timecode: int = 0
    nonserialized_metadata: CodecMetadata | None = None

    def visit_fields(self, v: Visitor) -> None:
        meta = self.nonserialized_metadata
        if v.conditional(meta is not None and meta.m.have_animation):
            self.duration = v.u32(U32Enc(Val(0), Val(1), Bits(8), Bits(32)),
                                  0, self.duration)
        if v.conditional(meta is not None
                         and meta.m.animation.have_timecodes):
            self.timecode = v.bits(32, 0, self.timecode)


_H_SHIFT = (0, 1, 1, 0)
_V_SHIFT = (0, 1, 0, 1)


@dataclasses.dataclass
class YCbCrChromaSubsampling:
    """frame_header.h:81-140."""
    channel_mode: list = dataclasses.field(default_factory=lambda: [0, 0, 0])

    def visit_fields(self, v: Visitor) -> None:
        for c in range(3):
            self.channel_mode[c] = v.bits(2, 0, self.channel_mode[c])

    @property
    def max_hshift(self) -> int:
        return max(_H_SHIFT[m] for m in self.channel_mode)

    @property
    def max_vshift(self) -> int:
        return max(_V_SHIFT[m] for m in self.channel_mode)

    def hshift(self, c: int) -> int:
        return self.max_hshift - _H_SHIFT[self.channel_mode[c]]

    def vshift(self, c: int) -> int:
        return self.max_vshift - _V_SHIFT[self.channel_mode[c]]

    def is_444(self) -> bool:
        return all(m == 0 for m in self.channel_mode)


@dataclasses.dataclass
class Passes:
    """frame_header.cc:137-177."""
    num_passes: int = 1
    num_downsample: int = 0
    shift: list = dataclasses.field(
        default_factory=lambda: [0] * MAX_NUM_PASSES)
    downsample: list = dataclasses.field(
        default_factory=lambda: [1] * MAX_NUM_PASSES)
    last_pass: list = dataclasses.field(
        default_factory=lambda: [0] * MAX_NUM_PASSES)

    def visit_fields(self, v: Visitor) -> None:
        self.num_passes = v.u32(U32Enc(Val(1), Val(2), Val(3),
                                       BitsOffset(3, 4)), 1, self.num_passes)
        if self.num_passes > MAX_NUM_PASSES:
            raise BitstreamError("too many passes")
        if v.conditional(self.num_passes != 1):
            self.num_downsample = v.u32(
                U32Enc(Val(0), Val(1), Val(2), BitsOffset(1, 3)), 0,
                self.num_downsample)
            if self.num_downsample > self.num_passes:
                raise BitstreamError("num_downsample > num_passes")
            for i in range(self.num_passes - 1):
                self.shift[i] = v.bits(2, 0, self.shift[i])
            self.shift[self.num_passes - 1] = 0
            for i in range(self.num_downsample):
                self.downsample[i] = v.u32(
                    U32Enc(Val(1), Val(2), Val(4), Val(8)), 1,
                    self.downsample[i])
                if i > 0 and self.downsample[i] >= self.downsample[i - 1]:
                    raise BitstreamError("downsample not decreasing")
            for i in range(self.num_downsample):
                self.last_pass[i] = v.u32(
                    U32Enc(Val(0), Val(1), Val(2), Bits(3)), 0,
                    self.last_pass[i])
                if i > 0 and self.last_pass[i] <= self.last_pass[i - 1]:
                    raise BitstreamError("last_pass not increasing")
                if self.last_pass[i] >= self.num_passes:
                    raise BitstreamError("last_pass >= num_passes")

    def downsampling_bracket(self, pass_idx: int) -> tuple[int, int]:
        """(min_shift, max_shift) of modular channels coded in this pass
        (frame_header.h GetDownsamplingBracket). An empty bracket
        (min > max) means the pass carries no modular AC channels."""
        max_shift, min_shift = 2, 3
        i = 0
        while True:
            for j in range(self.num_downsample):
                if i == self.last_pass[j]:
                    min_shift = {8: 3, 4: 2, 2: 1, 1: 0}[self.downsample[j]]
            if i == self.num_passes - 1:
                min_shift = 0
            if i == pass_idx:
                return min_shift, max_shift
            max_shift = min_shift - 1
            i += 1


_GAB_W1_DEFAULT = 1.1 * 0.104699568
_GAB_W2_DEFAULT = 1.1 * 0.055680538


@dataclasses.dataclass
class LoopFilter:
    """loop_filter.{h,cc}: gaborish + EPF parameters."""
    all_default: bool = True
    gab: bool = True
    gab_custom: bool = False
    gab_x_weight1: float = _GAB_W1_DEFAULT
    gab_x_weight2: float = _GAB_W2_DEFAULT
    gab_y_weight1: float = _GAB_W1_DEFAULT
    gab_y_weight2: float = _GAB_W2_DEFAULT
    gab_b_weight1: float = _GAB_W1_DEFAULT
    gab_b_weight2: float = _GAB_W2_DEFAULT
    epf_iters: int = 2
    epf_sharp_custom: bool = False
    epf_sharp_lut: list = dataclasses.field(
        default_factory=lambda: [i / (EPF_SHARP_ENTRIES - 1)
                                 for i in range(EPF_SHARP_ENTRIES)])
    epf_weight_custom: bool = False
    epf_channel_scale: list = dataclasses.field(
        default_factory=lambda: [40.0, 5.0, 3.5])
    epf_pass1_zeroflush: float = 0.45
    epf_pass2_zeroflush: float = 0.6
    epf_sigma_custom: bool = False
    epf_quant_mul: float = 0.46
    epf_pass0_sigma_scale: float = 0.9
    epf_pass2_sigma_scale: float = 6.5
    epf_border_sad_mul: float = 2.0 / 3
    epf_sigma_for_modular: float = 1.0
    extensions: int = 0
    nonserialized_is_modular: bool = False

    def visit_fields(self, v: Visitor) -> None:
        if v.all_default(self):
            return
        self.gab = v.bool_(True, self.gab)
        if v.conditional(self.gab):
            self.gab_custom = v.bool_(False, self.gab_custom)
            if v.conditional(self.gab_custom):
                self.gab_x_weight1 = v.f16(_GAB_W1_DEFAULT, self.gab_x_weight1)
                self.gab_x_weight2 = v.f16(_GAB_W2_DEFAULT, self.gab_x_weight2)
                self.gab_y_weight1 = v.f16(_GAB_W1_DEFAULT, self.gab_y_weight1)
                self.gab_y_weight2 = v.f16(_GAB_W2_DEFAULT, self.gab_y_weight2)
                self.gab_b_weight1 = v.f16(_GAB_W1_DEFAULT, self.gab_b_weight1)
                self.gab_b_weight2 = v.f16(_GAB_W2_DEFAULT, self.gab_b_weight2)
        self.epf_iters = v.bits(2, 2, self.epf_iters)
        if v.conditional(self.epf_iters > 0):
            if v.conditional(not self.nonserialized_is_modular):
                self.epf_sharp_custom = v.bool_(False, self.epf_sharp_custom)
                if v.conditional(self.epf_sharp_custom):
                    for i in range(EPF_SHARP_ENTRIES):
                        self.epf_sharp_lut[i] = v.f16(
                            i / (EPF_SHARP_ENTRIES - 1), self.epf_sharp_lut[i])
            self.epf_weight_custom = v.bool_(False, self.epf_weight_custom)
            if v.conditional(self.epf_weight_custom):
                self.epf_channel_scale[0] = v.f16(40.0,
                                                  self.epf_channel_scale[0])
                self.epf_channel_scale[1] = v.f16(5.0,
                                                  self.epf_channel_scale[1])
                self.epf_channel_scale[2] = v.f16(3.5,
                                                  self.epf_channel_scale[2])
                self.epf_pass1_zeroflush = v.f16(0.45,
                                                 self.epf_pass1_zeroflush)
                self.epf_pass2_zeroflush = v.f16(0.6, self.epf_pass2_zeroflush)
            self.epf_sigma_custom = v.bool_(False, self.epf_sigma_custom)
            if v.conditional(self.epf_sigma_custom):
                if v.conditional(not self.nonserialized_is_modular):
                    self.epf_quant_mul = v.f16(0.46, self.epf_quant_mul)
                self.epf_pass0_sigma_scale = v.f16(
                    0.9, self.epf_pass0_sigma_scale)
                self.epf_pass2_sigma_scale = v.f16(
                    6.5, self.epf_pass2_sigma_scale)
                self.epf_border_sad_mul = v.f16(
                    0.6666666666666666, self.epf_border_sad_mul)
            if v.conditional(self.nonserialized_is_modular):
                self.epf_sigma_for_modular = v.f16(
                    1.0, self.epf_sigma_for_modular)
                if self.epf_sigma_for_modular < 1e-8:
                    raise BitstreamError("EPF sigma for modular too small")
        self.extensions = v.begin_extensions(self.extensions)
        v.end_extensions()


@dataclasses.dataclass
class FrameHeader:
    """frame_header.cc:215-439."""
    nonserialized_metadata: CodecMetadata | None = None
    nonserialized_is_preview: bool = False

    all_default: bool = False
    frame_type: int = FrameType.REGULAR
    encoding: int = FrameEncoding.VARDCT
    flags: int = 0
    color_transform: int = ColorTransform.XYB
    chroma_subsampling: YCbCrChromaSubsampling = dataclasses.field(
        default_factory=YCbCrChromaSubsampling)
    upsampling: int = 1
    extra_channel_upsampling: list = dataclasses.field(default_factory=list)
    group_size_shift: int = 1
    x_qm_scale: int = 3
    b_qm_scale: int = 2
    passes: Passes = dataclasses.field(default_factory=Passes)
    dc_level: int = 0
    custom_size_or_origin: bool = False
    frame_origin_x0: int = 0
    frame_origin_y0: int = 0
    frame_xsize: int = 0
    frame_ysize: int = 0
    blending_info: BlendingInfo = dataclasses.field(
        default_factory=BlendingInfo)
    extra_channel_blending_info: list = dataclasses.field(default_factory=list)
    animation_frame: AnimationFrame = dataclasses.field(
        default_factory=AnimationFrame)
    is_last: bool = True
    save_as_reference: int = 0
    save_before_color_transform: bool = False
    name: str = ""
    loop_filter: LoopFilter = dataclasses.field(default_factory=LoopFilter)
    extensions: int = 0

    def default_xsize(self) -> int:
        if self.nonserialized_metadata is None:
            return 0
        if self.nonserialized_is_preview:
            return self.nonserialized_metadata.m.preview_size.xsize
        return self.nonserialized_metadata.xsize

    def default_ysize(self) -> int:
        if self.nonserialized_metadata is None:
            return 0
        if self.nonserialized_is_preview:
            return self.nonserialized_metadata.m.preview_size.ysize
        return self.nonserialized_metadata.ysize

    def can_be_referenced(self) -> bool:
        return (not self.is_last and self.frame_type != FrameType.DC_FRAME
                and (self.animation_frame.duration == 0
                     or self.save_as_reference != 0))

    def to_frame_dimensions(self) -> FrameDimensions:
        xsize = self.frame_xsize or self.default_xsize()
        ysize = self.frame_ysize or self.default_ysize()
        if self.dc_level != 0:
            xsize = div_ceil(xsize, 1 << (3 * self.dc_level))
            ysize = div_ceil(ysize, 1 << (3 * self.dc_level))
        return FrameDimensions.make(
            xsize, ysize, group_size_shift=self.group_size_shift,
            max_hshift=self.chroma_subsampling.max_hshift,
            max_vshift=self.chroma_subsampling.max_vshift,
            modular_mode=self.encoding == FrameEncoding.MODULAR,
            upsampling=self.upsampling)

    def needs_color_transform(self) -> bool:
        return (self.color_transform == ColorTransform.XYB
                and self.frame_type != FrameType.DC_FRAME
                and not self.save_before_color_transform)

    def visit_fields(self, v: Visitor) -> None:
        if v.all_default(self):
            return
        self.frame_type = v.u32(U32Enc(Val(0), Val(1), Val(2), Val(3)),
                                FrameType.REGULAR, self.frame_type)
        if v.reading and self.nonserialized_is_preview and \
                self.frame_type != FrameType.REGULAR:
            raise BitstreamError("preview must be a regular frame")
        is_modular = v.bool_(False, self.encoding == FrameEncoding.MODULAR)
        self.encoding = (FrameEncoding.MODULAR if is_modular
                         else FrameEncoding.VARDCT)
        self.flags = v.u64(0, self.flags)

        meta = self.nonserialized_metadata
        xyb_encoded = meta is None or meta.m.xyb_encoded
        if xyb_encoded:
            self.color_transform = ColorTransform.XYB
        else:
            alternate = v.bool_(
                False, self.color_transform == ColorTransform.YCBCR)
            self.color_transform = (ColorTransform.YCBCR if alternate
                                    else ColorTransform.NONE)

        if v.conditional(self.color_transform == ColorTransform.YCBCR
                         and (self.flags & FrameFlags.USE_DC_FRAME) == 0):
            v.visit_nested(self.chroma_subsampling)

        num_ec = meta.m.num_extra_channels if meta is not None else 0

        if v.conditional((self.flags & FrameFlags.USE_DC_FRAME) == 0):
            self.upsampling = v.u32(U32Enc(Val(1), Val(2), Val(4), Val(8)),
                                    1, self.upsampling)
            if meta is not None and v.conditional(num_ec != 0):
                if len(self.extra_channel_upsampling) != num_ec:
                    self.extra_channel_upsampling = [1] * num_ec
                for i in range(num_ec):
                    dim_shift = meta.m.extra_channel_info[i].dim_shift
                    ec_up = self.extra_channel_upsampling[i] >> dim_shift
                    ec_up = v.u32(U32Enc(Val(1), Val(2), Val(4), Val(8)),
                                  1, ec_up)
                    ec_up <<= dim_shift
                    if ec_up < self.upsampling:
                        raise BitstreamError("EC upsampling < color")
                    if ec_up > 8:
                        raise BitstreamError("EC upsampling too large")
                    self.extra_channel_upsampling[i] = ec_up
            else:
                self.extra_channel_upsampling = []

        if v.conditional(self.encoding == FrameEncoding.MODULAR):
            self.group_size_shift = v.bits(2, 1, self.group_size_shift)
        if v.conditional(self.encoding == FrameEncoding.VARDCT
                         and self.color_transform == ColorTransform.XYB):
            self.x_qm_scale = v.bits(3, 3, self.x_qm_scale)
            self.b_qm_scale = v.bits(3, 2, self.b_qm_scale)
        else:
            self.x_qm_scale = self.b_qm_scale = 2

        if v.conditional(self.frame_type != FrameType.REFERENCE_ONLY):
            v.visit_nested(self.passes)

        if v.conditional(self.frame_type == FrameType.DC_FRAME):
            self.dc_level = v.u32(U32Enc(Val(1), Val(2), Val(3), Val(4)),
                                  1, self.dc_level)
        if self.frame_type != FrameType.DC_FRAME:
            self.dc_level = 0

        is_partial_frame = False
        if v.conditional(self.frame_type != FrameType.DC_FRAME):
            self.custom_size_or_origin = v.bool_(False,
                                                 self.custom_size_or_origin)
            if v.conditional(self.custom_size_or_origin):
                enc = U32Enc(Bits(8), BitsOffset(11, 256),
                             BitsOffset(14, 2304), BitsOffset(30, 18688))
                if v.conditional(self.frame_type in (
                        FrameType.REGULAR, FrameType.SKIP_PROGRESSIVE)):
                    self.frame_origin_x0 = unpack_signed(
                        v.u32(enc, 0, pack_signed(self.frame_origin_x0)))
                    self.frame_origin_y0 = unpack_signed(
                        v.u32(enc, 0, pack_signed(self.frame_origin_y0)))
                self.frame_xsize = v.u32(enc, 0, self.frame_xsize)
                self.frame_ysize = v.u32(enc, 0, self.frame_ysize)
                if self.custom_size_or_origin and (
                        self.frame_xsize == 0 or self.frame_ysize == 0):
                    raise BitstreamError("zero frame crop size")
                if self.frame_type in (FrameType.REGULAR,
                                       FrameType.SKIP_PROGRESSIVE):
                    is_partial_frame = (
                        self.frame_origin_x0 > 0 or self.frame_origin_y0 > 0
                        or self.frame_xsize + self.frame_origin_x0
                        < self.default_xsize()
                        or self.frame_ysize + self.frame_origin_y0
                        < self.default_ysize())

        if v.conditional(self.frame_type in (FrameType.REGULAR,
                                             FrameType.SKIP_PROGRESSIVE)):
            self.blending_info.nonserialized_num_extra_channels = num_ec
            self.blending_info.nonserialized_is_partial_frame = \
                is_partial_frame
            v.visit_nested(self.blending_info)
            if len(self.extra_channel_blending_info) != num_ec:
                self.extra_channel_blending_info = [
                    BlendingInfo() for _ in range(num_ec)]
            for bi in self.extra_channel_blending_info:
                bi.nonserialized_num_extra_channels = num_ec
                bi.nonserialized_is_partial_frame = is_partial_frame
                v.visit_nested(bi)
            if v.conditional(meta is not None and meta.m.have_animation):
                self.animation_frame.nonserialized_metadata = meta
                v.visit_nested(self.animation_frame)
            self.is_last = v.bool_(True, self.is_last)
        else:
            self.is_last = False

        if v.conditional(self.frame_type != FrameType.DC_FRAME
                         and not self.is_last):
            self.save_as_reference = v.u32(
                U32Enc(Val(0), Val(1), Val(2), Val(3)), 0,
                self.save_as_reference)

        if self.frame_type != FrameType.DC_FRAME:
            if v.conditional(self.can_be_referenced()
                             and self.blending_info.mode == BlendMode.REPLACE
                             and not is_partial_frame
                             and self.frame_type in (
                                 FrameType.REGULAR,
                                 FrameType.SKIP_PROGRESSIVE)):
                self.save_before_color_transform = v.bool_(
                    False, self.save_before_color_transform)
            elif v.conditional(self.frame_type == FrameType.REFERENCE_ONLY):
                self.save_before_color_transform = v.bool_(
                    True, self.save_before_color_transform)
                if not self.save_before_color_transform and (
                        (self.custom_size_or_origin
                         and (self.frame_xsize < meta.xsize
                              or self.frame_ysize < meta.ysize
                              or self.frame_origin_x0 != 0
                              or self.frame_origin_y0 != 0))):
                    raise BitstreamError("invalid reference frame crop")
        else:
            self.save_before_color_transform = True

        self.name = visit_name_string(v, self.name)
        self.loop_filter.nonserialized_is_modular = is_modular
        v.visit_nested(self.loop_filter)
        self.extensions = v.begin_extensions(self.extensions)
        v.end_extensions()
