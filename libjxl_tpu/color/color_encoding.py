"""Color encoding bundles: color space / white point / primaries / TF.

Reference: lib/jxl/color_encoding_internal.{h,cc},
lib/jxl/cms/color_encoding_cms.h. Serialization matches
ColorEncoding::VisitFields; ICC synthesis for enum spaces is deferred
to the CMS module (icc.py) — internally we carry the enum description.
"""

from __future__ import annotations

import dataclasses
import enum

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.base.signed import pack_signed, unpack_signed
from libjxl_tpu.bitstream.fields import (
    Bits, BitsOffset, U32Enc, Val, Visitor, bundle_all_default,
)


class ColorSpace(enum.IntEnum):
    RGB = 0
    GRAY = 1
    XYB = 2
    UNKNOWN = 3


class WhitePoint(enum.IntEnum):
    D65 = 1
    CUSTOM = 2
    E = 10
    DCI = 11


class Primaries(enum.IntEnum):
    SRGB = 1
    CUSTOM = 2
    BT2100 = 9
    P3 = 11


class TransferFunction(enum.IntEnum):
    BT709 = 1
    UNKNOWN = 2
    LINEAR = 8
    SRGB = 13
    PQ = 16
    DCI = 17
    HLG = 18


class RenderingIntent(enum.IntEnum):
    PERCEPTUAL = 0
    RELATIVE = 1
    SATURATION = 2
    ABSOLUTE = 3


_XY_ENC = U32Enc(Bits(19), BitsOffset(19, 524288), BitsOffset(20, 1048576),
                 BitsOffset(21, 2097152))

GAMMA_MUL = 10_000_000
MAX_GAMMA = 8192


@dataclasses.dataclass
class Customxy:
    """Chromaticity scaled by 1e6 (color_encoding_internal.cc:100-113)."""
    x: int = 0
    y: int = 0

    def visit_fields(self, v: Visitor) -> None:
        self.x = unpack_signed(v.u32(_XY_ENC, 0, pack_signed(self.x)))
        self.y = unpack_signed(v.u32(_XY_ENC, 0, pack_signed(self.y)))

    def as_float(self) -> tuple[float, float]:
        return self.x * 1e-6, self.y * 1e-6

    @staticmethod
    def from_float(x: float, y: float) -> "Customxy":
        return Customxy(round(x * 1e6), round(y * 1e6))


@dataclasses.dataclass
class CustomTransferFunction:
    """color_encoding_internal.cc:115-143."""
    have_gamma: bool = False
    gamma: int = GAMMA_MUL  # gamma * 1e7
    transfer_function: int = TransferFunction.SRGB
    nonserialized_color_space: int = ColorSpace.RGB

    def set_implicit(self) -> bool:
        if self.nonserialized_color_space == ColorSpace.XYB:
            self.have_gamma = True
            self.gamma = round(GAMMA_MUL / 3)
            return True
        return False

    def visit_fields(self, v: Visitor) -> None:
        if v.conditional(not self.set_implicit()):
            self.have_gamma = v.bool_(False, self.have_gamma)
            if v.conditional(self.have_gamma):
                self.gamma = v.bits(24, GAMMA_MUL, self.gamma)
                if self.gamma > GAMMA_MUL or \
                        self.gamma * MAX_GAMMA < GAMMA_MUL:
                    raise BitstreamError(f"invalid gamma {self.gamma}")
            if v.conditional(not self.have_gamma):
                self.transfer_function = v.enum(TransferFunction.SRGB,
                                                self.transfer_function)

    @property
    def is_unknown(self) -> bool:
        return (not self.have_gamma
                and self.transfer_function == TransferFunction.UNKNOWN)


# sRGB primaries/white point as scaled-1e6 ints (spec values).
_SRGB_WHITE = (312700, 329000)       # D65
_SRGB_R = (639998, 330010)
_SRGB_G = (300038, 600003)
_SRGB_B = (150027, 59997)


@dataclasses.dataclass
class ColorEncoding:
    """color_encoding_internal.cc:144-209 ColorEncoding::VisitFields."""
    all_default: bool = True
    want_icc: bool = False
    color_space: int = ColorSpace.RGB
    white_point: int = WhitePoint.D65
    white: Customxy = dataclasses.field(default_factory=Customxy)
    primaries: int = Primaries.SRGB
    red: Customxy = dataclasses.field(default_factory=Customxy)
    green: Customxy = dataclasses.field(default_factory=Customxy)
    blue: Customxy = dataclasses.field(default_factory=Customxy)
    tf: CustomTransferFunction = dataclasses.field(
        default_factory=CustomTransferFunction)
    rendering_intent: int = RenderingIntent.RELATIVE
    icc: bytes = b""  # raw ICC profile when want_icc

    @property
    def has_primaries(self) -> bool:
        return self.color_space not in (ColorSpace.GRAY, ColorSpace.XYB)

    def implicit_white_point(self) -> bool:
        if self.color_space == ColorSpace.XYB:
            self.white_point = WhitePoint.D65
            return True
        return False

    @property
    def is_gray(self) -> bool:
        return self.color_space == ColorSpace.GRAY

    def visit_fields(self, v: Visitor) -> None:
        if v.all_default(self):
            return
        self.want_icc = v.bool_(False, self.want_icc)
        self.color_space = v.enum(ColorSpace.RGB, self.color_space)
        if v.conditional(not self.want_icc):
            if v.conditional(not self.implicit_white_point()):
                self.white_point = v.enum(WhitePoint.D65, self.white_point)
                if v.conditional(self.white_point == WhitePoint.CUSTOM):
                    v.visit_nested(self.white)
            if v.conditional(self.has_primaries):
                self.primaries = v.enum(Primaries.SRGB, self.primaries)
                if v.conditional(self.primaries == Primaries.CUSTOM):
                    v.visit_nested(self.red)
                    v.visit_nested(self.green)
                    v.visit_nested(self.blue)
            self.tf.nonserialized_color_space = self.color_space
            v.visit_nested(self.tf)
            self.rendering_intent = v.enum(RenderingIntent.RELATIVE,
                                           self.rendering_intent)
            if self.color_space == ColorSpace.UNKNOWN or self.tf.is_unknown:
                raise BitstreamError("no ICC but unknown color space/TF")

    # -- convenience constructors ------------------------------------------

    @staticmethod
    def srgb(is_gray: bool = False) -> "ColorEncoding":
        c = ColorEncoding()
        c.color_space = ColorSpace.GRAY if is_gray else ColorSpace.RGB
        c.tf.transfer_function = TransferFunction.SRGB
        c.all_default = not is_gray
        return c

    @staticmethod
    def linear_srgb(is_gray: bool = False) -> "ColorEncoding":
        c = ColorEncoding.srgb(is_gray)
        c.tf.transfer_function = TransferFunction.LINEAR
        c.all_default = False
        return c

    def white_point_xy(self) -> tuple[float, float]:
        if self.white_point == WhitePoint.D65:
            return _SRGB_WHITE[0] * 1e-6, _SRGB_WHITE[1] * 1e-6
        if self.white_point == WhitePoint.E:
            return 1 / 3, 1 / 3
        if self.white_point == WhitePoint.DCI:
            return 0.314, 0.351
        return self.white.as_float()

    def primaries_xy(self) -> tuple[tuple[float, float], ...]:
        if self.primaries == Primaries.SRGB:
            pts = (_SRGB_R, _SRGB_G, _SRGB_B)
            return tuple((x * 1e-6, y * 1e-6) for x, y in pts)
        if self.primaries == Primaries.BT2100:
            return ((0.708, 0.292), (0.170, 0.797), (0.131, 0.046))
        if self.primaries == Primaries.P3:
            return ((0.680, 0.320), (0.265, 0.690), (0.150, 0.060))
        return (self.red.as_float(), self.green.as_float(),
                self.blue.as_float())

    def same_color_encoding(self, other: "ColorEncoding") -> bool:
        return (self.color_space == other.color_space
                and self.white_point == other.white_point
                and self.primaries == other.primaries
                and self.tf.have_gamma == other.tf.have_gamma
                and (self.tf.gamma == other.tf.gamma if self.tf.have_gamma
                     else self.tf.transfer_function == other.tf.transfer_function))
