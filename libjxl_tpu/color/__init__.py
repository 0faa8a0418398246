"""Color layer: XYB, transfer functions, color encodings, CMS, ICC.

Reference layer L5: lib/jxl/cms/, enc_xyb.*, dec_xyb.*,
color_encoding_internal.*, icc_codec.*. Device math (XYB transforms,
transfer functions) lives in jax modules; host-side color metadata and
ICC codec live here.
"""

from libjxl_tpu.color.constants import (
    OPSIN_ABSORBANCE_MATRIX,
    DEFAULT_INVERSE_OPSIN_MATRIX,
    OPSIN_ABSORBANCE_BIAS,
    NEG_OPSIN_BIAS_RGBA,
    DEFAULT_QUANT_BIAS,
    DEFAULT_INTENSITY_TARGET,
)
from libjxl_tpu.color.color_encoding import (
    ColorSpace,
    WhitePoint,
    Primaries,
    TransferFunction,
    RenderingIntent,
    ColorEncoding,
)
