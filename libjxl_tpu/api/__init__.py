"""Public codec API.

Reference: lib/jxl/decode.cc / encode.cc event-driven C API; here the
one-shot convenience layer (extras/enc/jxl.cc-style usage). The
streaming/event API lives in api/decoder.py / api/encoder.py.
"""

from libjxl_tpu.api.simple import (
    DecodeResult, FrameResult, decode, decode_all, encode, encode_animation,
    encode_streaming,
)

__all__ = ["decode", "encode", "decode_all", "encode_animation",
           "encode_streaming", "DecodeResult", "FrameResult"]
