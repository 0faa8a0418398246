"""Global/per-block quantization scales.

Reference: lib/jxl/quantizer.{h,cc}: global_scale (denom 1<<16),
quant_dc, per-block raw quant field values in [1, 256]; and
AdjustQuantBias (quantizer-inl.h) applied at dequant time.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import (
    BitsOffset, U32Enc, Val, read_u32, write_u32,
)
from libjxl_tpu.color.constants import DEFAULT_QUANT_BIAS

GLOBAL_SCALE_DENOM = 1 << 16
GLOBAL_SCALE_SHIFT = 16
QUANT_MAX = 256

_GLOBAL_SCALE_ENC = U32Enc(BitsOffset(11, 1), BitsOffset(11, 2049),
                           BitsOffset(12, 4097), BitsOffset(16, 8193))
_QUANT_DC_ENC = U32Enc(Val(16), BitsOffset(5, 1), BitsOffset(8, 1),
                       BitsOffset(16, 1))


class Quantizer:
    def __init__(self, dequant, quant_dc: int = 64, global_scale: int = 64):
        self.dequant = dequant  # DequantMatrices
        self.global_scale = global_scale
        self.quant_dc = quant_dc

    @property
    def inv_global_scale(self) -> float:
        return GLOBAL_SCALE_DENOM / self.global_scale

    @property
    def global_scale_float(self) -> float:
        return self.global_scale / GLOBAL_SCALE_DENOM

    @property
    def inv_quant_dc(self) -> float:
        return self.inv_global_scale / self.quant_dc

    def inv_quant_ac(self, raw_quant: int) -> float:
        return self.inv_global_scale / raw_quant

    def mul_dc(self) -> np.ndarray:
        """Per-channel DC dequant step."""
        return self.inv_quant_dc * self.dequant.dc_quant

    def inv_mul_dc(self) -> np.ndarray:
        return self.dequant.inv_dc_quant * \
            (self.global_scale_float * self.quant_dc)

    def set_quant_field(self, quant_dc: float, qf: np.ndarray
                        ) -> np.ndarray:
        """Quantizer::SetQuantField (quantizer.cc:45-115): global_scale
        chosen so the qf MEDIAN (reduced by its median absolute
        deviation) maps to raw value kQuantFieldTarget=5 — small raw
        values keep the coded field cheap and give the integer quant
        adjustments their intended ~20% granularity. Returns the raw
        int quant field."""
        qf = np.asarray(qf, np.float32)
        flat = np.sort(qf.ravel())
        median = float(flat[flat.size // 2])
        absd = np.sort(np.abs(qf.ravel() - median))
        mad = float(absd[absd.size // 2])
        k_quant_field_target = 5.0
        k_global_scale_numerator = 4096
        scale = GLOBAL_SCALE_DENOM * (median - mad) / k_quant_field_target
        scale = max(1.0, min(scale, float(1 << 15)))
        new_gs = int(scale)
        scaled_quant_dc = int(quant_dc * k_global_scale_numerator * 1.6)
        if new_gs > scaled_quant_dc:
            new_gs = max(scaled_quant_dc, 1)
        self.global_scale = new_gs
        inv = GLOBAL_SCALE_DENOM / new_gs
        self.quant_dc = int(min(quant_dc * inv + 0.5, float(1 << 16)))
        raw = np.clip(qf * inv + 0.5, 1, QUANT_MAX).astype(np.int32)
        return raw

    def decode(self, r: BitReader) -> None:
        self.global_scale = read_u32(_GLOBAL_SCALE_ENC, r)
        self.quant_dc = read_u32(_QUANT_DC_ENC, r)

    def encode(self, w: BitWriter) -> None:
        write_u32(_GLOBAL_SCALE_ENC, self.global_scale, w)
        write_u32(_QUANT_DC_ENC, self.quant_dc, w)


def adjust_quant_bias(quantized: np.ndarray,
                      biases: np.ndarray = DEFAULT_QUANT_BIAS) -> np.ndarray:
    """AdjustQuantBias (quantizer-inl.h): per-channel dequant bias.

    quantized: (3, ...) int array. Returns float array:
      0 -> 0; +-1 -> +-bias[c]; else x - bias[3]/x.
    """
    q = quantized.astype(np.float32)
    out = np.empty_like(q)
    for c in range(3):
        x = q[c]
        with np.errstate(divide="ignore", invalid="ignore"):
            general = x - biases[3] / np.where(x == 0, 1, x)
        out[c] = np.where(x == 0, 0.0,
                          np.where(x == 1, biases[c],
                                   np.where(x == -1, -biases[c], general)))
    return out
