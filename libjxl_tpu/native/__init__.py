"""Native host runtime bindings (ctypes).

Builds/loads jxl_native.so for the sequential entropy-coded loops;
falls back to the pure-Python reference paths when unavailable.
Build: `python -m libjxl_tpu.native.build` (automatic on first use).
"""

from libjxl_tpu.native.bindings import (
    available as native_available,
    get_lib,
)

__all__ = ["native_available", "get_lib"]
