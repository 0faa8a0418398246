"""Context map (de)serialization with MTF + nested entropy coding.

Reference: lib/jxl/dec_context_map.cc, enc_context_map.cc,
inverse_mtf-inl.h. A context map assigns each of N contexts one of up
to 256 clustered histograms; itself entropy-coded (simple raw bits for
few clusters, else MTF + ANS).
"""

from __future__ import annotations

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter

MAX_CLUSTERS = 256


def inverse_mtf(values: list[int]) -> list[int]:
    mtf = list(range(256))
    out = []
    for v in values:
        sym = mtf[v]
        out.append(sym)
        mtf.pop(v)
        mtf.insert(0, sym)
    return out


def forward_mtf(values: list[int]) -> list[int]:
    mtf = list(range(256))
    out = []
    for v in values:
        idx = mtf.index(v)
        out.append(idx)
        mtf.pop(idx)
        mtf.insert(0, v)
    return out


def _native_read_map(codes, r: BitReader, n: int, use_mtf: bool):
    """Native ANS stream read + inverse MTF for the context-map body
    (native/jxl_native.cpp ans_read_stream_u32 / inverse_mtf_u32)."""
    if codes.use_prefix_code:
        return None
    try:
        from libjxl_tpu.native.bindings import NativeModularDecoder, get_lib
    except Exception:
        return None
    lib = get_lib()
    if lib is None:
        return None
    import ctypes as C

    import numpy as np

    dec = NativeModularDecoder(r.raw_data, r.bits_consumed, codes, 0)
    try:
        out = np.empty(max(n, 1), np.uint32)
        ptr = out.ctypes.data_as(C.POINTER(C.c_uint32))
        rc = lib.ans_read_stream_u32(
            dec.handle, int(codes.context_map[0]), n, ptr)
        if rc != 0:
            raise BitstreamError("context map over-reads the stream")
        if not dec.check_final():
            raise BitstreamError("invalid ANS state after context map")
        r.seek_bits(dec.bit_pos())
        if int(out[:n].max(initial=0)) >= MAX_CLUSTERS:
            raise BitstreamError("invalid cluster id in context map")
        if use_mtf:
            lib.inverse_mtf_u32(ptr, n)
    finally:
        dec.close()
    return [int(v) for v in out[:n]]


def decode_context_map(num_contexts: int, r: BitReader) -> tuple[list[int], int]:
    """Returns (context_map, num_histograms). dec_context_map.cc:48-95."""
    from libjxl_tpu.entropy.codes import decode_histograms, SymbolReader

    is_simple = r.read_bool()
    if is_simple:
        bits_per_entry = r.read(2)
        if bits_per_entry:
            context_map = [r.read(bits_per_entry) for _ in range(num_contexts)]
        else:
            context_map = [0] * num_contexts
    else:
        use_mtf = r.read_bool()
        codes = decode_histograms(r, 1, disallow_lz77=num_contexts <= 2)
        context_map = _native_read_map(codes, r, num_contexts, use_mtf)
        if context_map is None:
            reader = SymbolReader(codes, r)
            context_map = [reader.read_clustered(codes.context_map[0])
                           for _ in range(num_contexts)]
            if max(context_map) >= MAX_CLUSTERS:
                raise BitstreamError("invalid cluster id in context map")
            if not reader.check_final_state():
                raise BitstreamError("invalid ANS state after context map")
            if use_mtf:
                context_map = inverse_mtf(context_map)
    num_histograms = max(context_map) + 1
    used = set(context_map)
    if any(h >= num_histograms for h in context_map) or \
            len(used) != num_histograms:
        raise BitstreamError("incomplete context map")
    return context_map, num_histograms


def encode_context_map(context_map: list[int], num_histograms: int,
                       w: BitWriter) -> None:
    """enc_context_map.cc EncodeContextMap."""
    from libjxl_tpu.entropy.codes import (
        Token, build_and_encode_histograms, write_tokens)
    from libjxl_tpu.entropy.ans import HybridUintConfig

    if num_histograms == 1:
        w.write_bool(True)
        w.write(2, 0)
        return
    bits_per_entry = (num_histograms - 1).bit_length()

    # Entropy-coded candidate (MTF + ANS), built on a trial writer so we
    # can cost-compare against the raw fixed-width path
    # (enc_context_map.cc chooses the cheaper encoding).
    mtf_values = forward_mtf(context_map)
    tokens = [Token(0, v) for v in mtf_values]
    trial = BitWriter()
    trial_codes = build_and_encode_histograms(
        1, [tokens], trial, uint_config=HybridUintConfig(2, 0, 1))
    write_tokens(tokens, trial_codes, trial)
    entropy_cost = 2 + trial.bits_written  # not-simple + use-mtf bits

    if bits_per_entry <= 3 and \
            1 + 2 + bits_per_entry * len(context_map) <= entropy_cost:
        w.write_bool(True)
        w.write(2, bits_per_entry)
        for v in context_map:
            w.write(bits_per_entry, v)
        return
    w.write_bool(False)   # not simple
    w.write_bool(True)    # use MTF
    codes = build_and_encode_histograms(
        1, [tokens], w, uint_config=HybridUintConfig(2, 0, 1))
    write_tokens(tokens, codes, w)
