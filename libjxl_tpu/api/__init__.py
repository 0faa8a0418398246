"""Public codec API.

Reference: lib/jxl/decode.cc / encode.cc event-driven C API; here the
one-shot convenience layer (extras/enc/jxl.cc-style usage). The
streaming/event API lives in api/decoder.py / api/encoder.py.
"""

from libjxl_tpu.api.simple import (
    DecodeResult, FrameResult, decode, decode_all, encode, encode_animation,
    encode_streaming,
)


def decode_low_memory(data, callback):
    """Row-streaming decode with O(group-row) peak memory; see
    frame/low_memory.py (low_memory_render_pipeline analogue)."""
    from libjxl_tpu.frame.low_memory import decode_low_memory as _impl
    return _impl(data, callback)


__all__ = ["decode", "encode", "decode_all", "encode_animation",
           "encode_streaming", "decode_low_memory", "DecodeResult",
           "FrameResult"]
