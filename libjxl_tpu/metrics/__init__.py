"""Quality metrics: PSNR, pnorm, SSIMULACRA2, butteraugli.

Reference: lib/extras/metrics.{h,cc}, tools/ssimulacra2.cc,
lib/jxl/butteraugli/. Used by the encoder's quality loops and the
benchmark harness.
"""

from libjxl_tpu.metrics.simple import psnr, max_abs_error
from libjxl_tpu.metrics.ssimulacra2 import ssimulacra2

__all__ = ["psnr", "max_abs_error", "ssimulacra2"]
