"""Chroma-from-luma: per-64x64-tile X/B-from-Y correlation factors.

Reference: lib/jxl/chroma_from_luma.{h,cc}. Factors are signed ints in
fixed point with color_factor denominator (default 84); the DC factors
and base correlations are signaled in the frame's DC global section.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import (
    BitsOffset, U32Enc, Val, read_u32, write_u32, read_f16, write_f16,
)

COLOR_TILE_DIM = 64
COLOR_TILE_DIM_IN_BLOCKS = 8
DEFAULT_COLOR_FACTOR = 84

_COLOR_FACTOR_ENC = U32Enc(Val(DEFAULT_COLOR_FACTOR), Val(256),
                           BitsOffset(8, 2), BitsOffset(16, 258))


@dataclasses.dataclass
class ColorCorrelation:
    """chroma_from_luma.h:50-137."""
    color_factor: int = DEFAULT_COLOR_FACTOR
    base_correlation_x: float = 0.0
    base_correlation_b: float = 1.0
    ytox_dc: int = 0
    ytob_dc: int = 0

    @property
    def color_scale(self) -> float:
        return 1.0 / self.color_factor

    def ytox(self, factor: int) -> float:
        return self.base_correlation_x + factor * self.color_scale

    def ytob(self, factor: int) -> float:
        return self.base_correlation_b + factor * self.color_scale

    def dc_factors(self) -> np.ndarray:
        return np.array([self.ytox(self.ytox_dc), 0.0,
                         self.ytob(self.ytob_dc)], np.float32)

    def decode_dc(self, r: BitReader) -> None:
        """ColorCorrelation::DecodeDC (chroma_from_luma.cc)."""
        if r.read_bool():  # all_default
            self.__init__()
            return
        self.color_factor = read_u32(_COLOR_FACTOR_ENC, r)
        self.base_correlation_x = read_f16(r)
        self.base_correlation_b = read_f16(r)
        if abs(self.base_correlation_x) > 4.0 or \
                abs(self.base_correlation_b) > 4.0:
            raise BitstreamError("base correlation out of range")
        self.ytox_dc = r.read(8) - 128
        self.ytob_dc = r.read(8) - 128

    def encode_dc(self, w: BitWriter) -> None:
        is_default = (self.color_factor == DEFAULT_COLOR_FACTOR
                      and self.base_correlation_x == 0.0
                      and self.base_correlation_b == 1.0
                      and self.ytox_dc == 0 and self.ytob_dc == 0)
        w.write_bool(is_default)
        if is_default:
            return
        write_u32(_COLOR_FACTOR_ENC, self.color_factor, w)
        write_f16(self.base_correlation_x, w)
        write_f16(self.base_correlation_b, w)
        w.write(8, self.ytox_dc + 128)
        w.write(8, self.ytob_dc + 128)


@dataclasses.dataclass
class ColorCorrelationMap:
    """Per-tile factor maps (int32 planes, one entry per 64x64 tile)."""
    base: ColorCorrelation
    ytox_map: np.ndarray  # (tiles_y, tiles_x) int32
    ytob_map: np.ndarray

    @staticmethod
    def create(xsize: int, ysize: int) -> "ColorCorrelationMap":
        tx = (xsize + COLOR_TILE_DIM - 1) // COLOR_TILE_DIM
        ty = (ysize + COLOR_TILE_DIM - 1) // COLOR_TILE_DIM
        return ColorCorrelationMap(ColorCorrelation(),
                                   np.zeros((ty, tx), np.int32),
                                   np.zeros((ty, tx), np.int32))
