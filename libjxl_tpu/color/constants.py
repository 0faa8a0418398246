"""XYB color space constants (reference: lib/jxl/cms/opsin_params.h,
lib/jxl/quantizer.h:52). These define the format — frozen by spec."""

import numpy as np

_M02 = 0.078
_M00 = 0.30
_M01 = 1.0 - _M02 - _M00
_M12 = 0.078
_M10 = 0.23
_M11 = 1.0 - _M12 - _M10
_M20 = 0.24342268924547819
_M21 = 0.20476744424496821
_M22 = 1.0 - _M20 - _M21

OPSIN_ABSORBANCE_MATRIX = np.array(
    [[_M00, _M01, _M02], [_M10, _M11, _M12], [_M20, _M21, _M22]], np.float32)

DEFAULT_INVERSE_OPSIN_MATRIX = np.array(
    [[11.031566901960783, -9.866943921568629, -0.16462299647058826],
     [-3.254147380392157, 4.418770392156863, -0.16462299647058826],
     [-3.6588512862745097, 2.7129230470588235, 1.9459282392156863]],
    np.float32)

OPSIN_ABSORBANCE_BIAS0 = 0.0037930732552754493
OPSIN_ABSORBANCE_BIAS = np.array([OPSIN_ABSORBANCE_BIAS0] * 3, np.float32)
NEG_OPSIN_BIAS_RGBA = np.array(
    [-OPSIN_ABSORBANCE_BIAS0, -OPSIN_ABSORBANCE_BIAS0,
     -OPSIN_ABSORBANCE_BIAS0, 1.0], np.float32)

# quantizer.h:52 kDefaultQuantBias (x-channel, y, b, numerator)
DEFAULT_QUANT_BIAS = np.array(
    [1.0 - 0.05465007330715401, 1.0 - 0.07005449891748593,
     1.0 - 0.049935103337343655, 0.145], np.float32)

DEFAULT_INTENSITY_TARGET = 255.0  # base/common.h:104

# Scaled XYB offsets/scales (opsin_params.h:65-80), used by ssimulacra2
# and XYB-to-display mappings.
SCALED_XYB_OFFSET = np.array([0.015386134, 0.0, 0.27770459], np.float32)
SCALED_XYB_SCALE = np.array([22.995788804, 1.183000077, 1.502141333],
                            np.float32)
