"""Entropy-code sets: LZ77 params, uint configs, context maps, token IO.

Reference: lib/jxl/dec_ans.cc (DecodeHistograms, DecodeUintConfig,
LZ77Params, ANSSymbolReader LZ77 window), enc_ans.cc
(BuildAndEncodeHistograms, WriteTokens, EncodeUintConfigs).

A `SymbolReader`/`write_tokens` pair transports hybrid-uint tokens for
every consumer (VarDCT coefficients, modular streams, context maps,
coefficient orders, ICC...). The ANS token loop is the sequential host
bottleneck by design; everything downstream is dense tensors.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import (
    Val, Bits, BitsOffset, U32Enc, read_u32, write_u32,
)
from libjxl_tpu.entropy import ans
from libjxl_tpu.entropy.ans import (
    ANS_LOG_TAB_SIZE, ANS_TAB_SIZE, ANS_MAX_ALPHABET_SIZE, PREFIX_MAX_BITS,
    AliasTable, AnsEncoder, AnsState, HybridUintConfig,
    build_reverse_maps, ceil_log2, init_alias_table, normalize_counts,
    read_histogram, write_histogram,
)
from libjxl_tpu.entropy.prefix import (
    PrefixCode, decode_prefix_code, build_and_store_prefix_code,
)

# LZ77 constants (dec_ans.h:122-145)
LZ77_WINDOW_SIZE = 1 << 20
_SPECIAL_DISTANCES = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
NUM_SPECIAL_DISTANCES = len(_SPECIAL_DISTANCES)


def special_distance(index: int, multiplier: int) -> int:
    a, b = _SPECIAL_DISTANCES[index]
    d = a + multiplier * b
    return d if d > 1 else 1


@dataclasses.dataclass
class LZ77Params:
    """dec_ans.h:105-120; serialized via LZ77Params::VisitFields."""
    enabled: bool = False
    min_symbol: int = 224
    min_length: int = 3
    length_uint_config: HybridUintConfig = dataclasses.field(
        default_factory=lambda: HybridUintConfig(0, 0, 0))

    _MIN_SYMBOL_ENC = U32Enc(Val(224), Val(512), Val(4096), BitsOffset(15, 8))
    _MIN_LENGTH_ENC = U32Enc(Val(3), Val(4), BitsOffset(2, 5), BitsOffset(8, 9))

    def read(self, r: BitReader) -> None:
        self.enabled = r.read_bool()
        if self.enabled:
            self.min_symbol = read_u32(self._MIN_SYMBOL_ENC, r)
            self.min_length = read_u32(self._MIN_LENGTH_ENC, r)

    def write(self, w: BitWriter) -> None:
        w.write_bool(self.enabled)
        if self.enabled:
            write_u32(self._MIN_SYMBOL_ENC, self.min_symbol, w)
            write_u32(self._MIN_LENGTH_ENC, self.min_length, w)


def read_uint_config(log_alpha_size: int, r: BitReader) -> HybridUintConfig:
    """dec_ans.cc:272-295."""
    split_exponent = r.read(ceil_log2(log_alpha_size + 1))
    msb_in_token = 0
    lsb_in_token = 0
    if split_exponent != log_alpha_size:
        nbits = ceil_log2(split_exponent + 1)
        msb_in_token = r.read(nbits)
        if msb_in_token > split_exponent:
            raise BitstreamError("invalid HybridUintConfig msb")
        nbits = ceil_log2(split_exponent - msb_in_token + 1)
        lsb_in_token = r.read(nbits)
    if lsb_in_token + msb_in_token > split_exponent:
        raise BitstreamError("invalid HybridUintConfig")
    return HybridUintConfig(split_exponent, msb_in_token, lsb_in_token)


def write_uint_config(cfg: HybridUintConfig, w: BitWriter,
                      log_alpha_size: int) -> None:
    """enc_ans.cc:1023-1035."""
    w.write(ceil_log2(log_alpha_size + 1), cfg.split_exponent)
    if cfg.split_exponent == log_alpha_size:
        return
    nbits = ceil_log2(cfg.split_exponent + 1)
    w.write(nbits, cfg.msb_in_token)
    nbits = ceil_log2(cfg.split_exponent - cfg.msb_in_token + 1)
    w.write(nbits, cfg.lsb_in_token)


@dataclasses.dataclass
class EntropyCodes:
    """Decoded/built entropy codes (reference ANSCode + EntropyEncodingData)."""
    lz77: LZ77Params
    context_map: list[int]          # context -> clustered histogram idx
    use_prefix_code: bool
    log_alpha_size: int
    uint_configs: list[HybridUintConfig]         # per clustered histogram
    alias_tables: list[AliasTable] | None = None  # ANS mode
    prefix_codes: list[PrefixCode] | None = None  # prefix mode
    # encoder-side:
    counts: list[list[int]] | None = None         # normalized histograms
    reverse_maps: list[list[np.ndarray]] | None = None
    # packed (freqs, rmap, rmap_off, alpha) for the native token writer
    enc_tables: tuple | None = None

    @property
    def num_histograms(self) -> int:
        return len(self.uint_configs)

    @property
    def lz77_distance_ctx(self) -> int:
        return self.context_map[-1]


def decode_histograms(r: BitReader, num_contexts: int,
                      disallow_lz77: bool = False) -> EntropyCodes:
    """dec_ans.cc:341-376 DecodeHistograms."""
    from libjxl_tpu.entropy.context_map import decode_context_map

    lz77 = LZ77Params()
    lz77.read(r)
    if lz77.enabled:
        if disallow_lz77:
            raise BitstreamError("LZ77 disallowed here")
        num_contexts += 1
        lz77.length_uint_config = read_uint_config(8, r)
    if num_contexts > 1:
        context_map, num_histograms = decode_context_map(num_contexts, r)
    else:
        context_map = [0]
        num_histograms = 1
    use_prefix_code = r.read_bool()
    if use_prefix_code:
        log_alpha_size = PREFIX_MAX_BITS
    else:
        log_alpha_size = r.read(2) + 5
    uint_configs = [read_uint_config(log_alpha_size, r)
                    for _ in range(num_histograms)]
    codes = EntropyCodes(lz77=lz77, context_map=context_map,
                         use_prefix_code=use_prefix_code,
                         log_alpha_size=log_alpha_size,
                         uint_configs=uint_configs)
    max_alphabet_size = 1 << log_alpha_size
    if use_prefix_code:
        # dec_ans.cc:201-231: alphabet sizes first, then code tables.
        alphabet_sizes = [ans.read_varlen_u16(r) + 1
                          for _ in range(num_histograms)]
        for sz in alphabet_sizes:
            if sz > max_alphabet_size:
                raise BitstreamError("prefix alphabet too large")
        # dec_ans.cc:212: a 1-symbol alphabet is a 0-bit degenerate code
        # with NO stored table — reading one would desync the stream.
        codes.prefix_codes = [
            decode_prefix_code(sz, r) if sz > 1
            else PrefixCode([0], {}, degenerate_symbol=0)
            for sz in alphabet_sizes]
    else:
        codes.alias_tables = []
        if not _native_read_histograms(r, num_histograms, log_alpha_size,
                                       max_alphabet_size, codes):
            for _ in range(num_histograms):
                counts = read_histogram(ANS_LOG_TAB_SIZE, r)
                if len(counts) > max_alphabet_size:
                    raise BitstreamError("ANS alphabet too large")
                codes.alias_tables.append(
                    init_alias_table(counts, log_alpha_size))
    return codes


def _native_read_histograms(r: BitReader, num: int, log_alpha_size: int,
                            max_alpha: int, codes: "EntropyCodes") -> bool:
    """Fused native ReadHistogram + InitAliasTable: one C call for the
    whole histogram set; stores the packed alias slots for reuse by
    NativeModularDecoder (native/jxl_native.cpp ans_read_histograms_build)."""
    try:
        from libjxl_tpu.native.bindings import get_lib
    except Exception:
        return False
    lib = get_lib()
    if lib is None:
        return False
    import ctypes as C

    data = r.raw_data
    # Packed alias slots: value:8 | offset:12 | (freq-1):12.
    packed = np.zeros((num, ANS_TAB_SIZE), np.uint32)
    alpha = np.zeros(num, np.int32)
    pos = C.c_uint64(r.bits_consumed)
    rc = lib.ans_read_histograms_build(
        data, len(data), C.byref(pos), num, log_alpha_size, max_alpha,
        packed.ctypes.data_as(C.POINTER(C.c_uint32)),
        alpha.ctypes.data_as(C.POINTER(C.c_int32)))
    if rc == -1:
        # Trailing peek refilled past the buffer end: mirror the Python
        # BitReader, which flags over-read but leaves validation to the
        # section-consumption / ANS-state checks downstream.
        r.overread = True
    elif rc != 0:
        raise BitstreamError(f"invalid ANS histogram ({rc})")
    r.seek_bits(pos.value)
    for h in range(num):
        p = packed[h]
        codes.alias_tables.append(AliasTable(
            value=(p & np.uint32(0xFF)).astype(np.uint16),
            offset=((p >> np.uint32(8)) & np.uint32(0xFFF)
                    ).astype(np.uint16),
            freq=((p >> np.uint32(20)) + np.uint32(1)).astype(np.uint32)))
    codes._packed_native = np.ascontiguousarray(packed.reshape(-1))
    return True


class SymbolReader:
    """ANSSymbolReader: token reads with LZ77 window + hybrid uint.

    Construct AFTER histograms are decoded, right before the token
    stream; reads the 32-bit initial ANS state (dec_ans.cc:392-419).
    """

    def __init__(self, codes: EntropyCodes, r: BitReader,
                 distance_multiplier: int = 0):
        self.codes = codes
        self.r = r
        if not codes.use_prefix_code:
            if codes.alias_tables is None and codes.counts is not None:
                # Encoder-built codes skip the Python alias tables
                # (native enc_tables path); materialize for decoding.
                _python_encoder_tables(codes)
            self.state = AnsState(r)
        else:
            self.state = None
        self.lz77 = codes.lz77
        if self.lz77.enabled:
            self.window = np.zeros(LZ77_WINDOW_SIZE, np.uint32)
            self.num_decoded = 0
            self.num_to_copy = 0
            self.copy_pos = 0
            self.lz77_ctx = codes.lz77_distance_ctx
            self.num_special = (NUM_SPECIAL_DISTANCES
                                if distance_multiplier else 0)
            self.special = [special_distance(i, distance_multiplier)
                            for i in range(self.num_special)]
        else:
            self.window = None

    def _read_symbol(self, histo_idx: int) -> int:
        if self.codes.use_prefix_code:
            return self.codes.prefix_codes[histo_idx].read_symbol(self.r)
        return self.state.read_symbol(self.codes.alias_tables[histo_idx],
                                      self.r)

    def read(self, ctx: int) -> int:
        """ReadHybridUint with non-clustered context."""
        return self.read_clustered(self.codes.context_map[ctx])

    def read_clustered(self, histo_idx: int) -> int:
        """dec_ans.h:288-353 ReadHybridUintClustered."""
        lz = self.window is not None
        if lz and self.num_to_copy > 0:
            ret = int(self.window[self.copy_pos % LZ77_WINDOW_SIZE])
            self.copy_pos += 1
            self.num_to_copy -= 1
            self.window[self.num_decoded % LZ77_WINDOW_SIZE] = ret
            self.num_decoded += 1
            return ret
        token = self._read_symbol(histo_idx)
        if lz and token >= self.lz77.min_symbol:
            self.num_to_copy = self.lz77.length_uint_config.read(
                token - self.lz77.min_symbol, self.r) + self.lz77.min_length
            d_token = self._read_symbol(self.lz77_ctx)
            distance = self.codes.uint_configs[self.lz77_ctx].read(
                d_token, self.r)
            if distance < self.num_special:
                distance = self.special[distance]
            else:
                distance = distance + 1 - self.num_special
            distance = min(distance, self.num_decoded, LZ77_WINDOW_SIZE)
            self.copy_pos = self.num_decoded - distance
            if distance == 0:
                to_fill = min(self.num_to_copy, LZ77_WINDOW_SIZE)
                self.window[:to_fill] = 0
            ret = int(self.window[self.copy_pos % LZ77_WINDOW_SIZE])
            self.copy_pos += 1
            self.num_to_copy -= 1
            self.window[self.num_decoded % LZ77_WINDOW_SIZE] = ret
            self.num_decoded += 1
            return ret
        ret = self.codes.uint_configs[histo_idx].read(token, self.r)
        if lz:
            self.window[self.num_decoded % LZ77_WINDOW_SIZE] = ret
            self.num_decoded += 1
        return ret

    def check_final_state(self) -> bool:
        if self.codes.use_prefix_code:
            return True
        return self.state.check_final_state()


# ---------------------------------------------------------------------------
# Encoder side


@dataclasses.dataclass(frozen=True)
class Token:
    """enc_ans.h:82-89."""
    context: int
    value: int
    is_lz77_length: bool = False


def stream_arrays(stream):
    """Normalize a token stream to (ctx int32[], value uint32[]) arrays."""
    if isinstance(stream, tuple):
        return (np.asarray(stream[0], np.int32),
                np.asarray(stream[1], np.uint32))
    ctx = np.fromiter((t.context for t in stream), np.int32, len(stream))
    val = np.fromiter((t.value for t in stream), np.uint32, len(stream))
    return ctx, val


def build_and_encode_histograms(
        num_contexts: int,
        token_streams: list,
        w: BitWriter,
        *,
        use_prefix_code: bool = False,
        uint_config: HybridUintConfig | None = None,
        max_clusters: int = 64,
) -> EntropyCodes:
    """BuildAndEncodeHistograms (enc_ans.cc:1082) minus LZ77 search.

    Streams may be lists of Token or (ctx, value) array pairs.
    Clusters per-context token histograms, writes LZ77 params (disabled),
    context map, uint configs and histograms; returns codes usable with
    write_tokens. LZ77 token generation is handled by the caller
    producing is_lz77_length tokens (not emitted by this builder yet).
    """
    from libjxl_tpu.entropy.cluster import cluster_histograms
    from libjxl_tpu.entropy.context_map import encode_context_map

    uint_config = uint_config or HybridUintConfig(4, 2, 0)
    lz77 = LZ77Params(enabled=False)
    lz77.write(w)

    # Tokenize values to symbol histograms (native C loop when
    # available, vectorized numpy otherwise).
    max_token = 0
    hist2d = np.zeros((num_contexts, ANS_MAX_ALPHABET_SIZE), np.int64)
    native_hist = _native_token_histogram_fn()
    for stream in token_streams:
        ctx, val = stream_arrays(stream)
        if len(val) == 0:
            continue
        if native_hist:
            # token_histogram accumulates in place (jxl_native.cpp),
            # so the 2-D histogram is passed directly — a per-stream
            # zeroed scratch dominated encode profiles (~35 ms/stream
            # at AC context counts).
            mt = native_hist(ctx, val, uint_config, hist2d)
            if mt < 0:
                raise BitstreamError(
                    f"native token histogram failed ({mt})")
        else:
            toks, _, _ = uint_config.encode_np(val)
            if toks.max() >= ANS_MAX_ALPHABET_SIZE:
                raise BitstreamError("token exceeds ANS alphabet")
            np.add.at(hist2d, (ctx, toks.astype(np.int64)), 1)
            mt = int(toks.max())
        max_token = max(max_token, int(mt))
    histograms = list(hist2d)

    return _finish_histograms(histograms, num_contexts, w,
                              use_prefix_code, uint_config, max_token,
                              lz77, max_clusters)


def _finish_histograms(histograms, num_contexts, w, use_prefix_code,
                       uint_config, max_token, lz77,
                       max_clusters=64, force_log_alpha=None):
    from libjxl_tpu.entropy.cluster import cluster_histograms
    from libjxl_tpu.entropy.context_map import encode_context_map

    if num_contexts > 1:
        context_map, clustered = cluster_histograms(histograms,
                                                    max_clusters)
        encode_context_map(context_map, len(clustered), w)
    else:
        context_map = [0]
        clustered = [histograms[0]]

    w.write_bool(use_prefix_code)
    if use_prefix_code:
        log_alpha_size = PREFIX_MAX_BITS
    else:
        log_alpha_size = force_log_alpha or max(5, ceil_log2(max_token + 1))
        w.write(2, log_alpha_size - 5)
    uint_configs = [uint_config] * len(clustered)
    for cfg in uint_configs:
        write_uint_config(cfg, w, log_alpha_size)

    codes = EntropyCodes(lz77=lz77, context_map=context_map,
                         use_prefix_code=use_prefix_code,
                         log_alpha_size=log_alpha_size,
                         uint_configs=uint_configs)
    if use_prefix_code:
        codes.prefix_codes = []
        alphabet_sizes = []
        for h in clustered:
            nz = np.nonzero(h)[0]
            alphabet_sizes.append(int(nz[-1]) + 1 if len(nz) else 1)
        for sz in alphabet_sizes:
            ans.write_varlen_u16(sz - 1, w)
        for h, sz in zip(clustered, alphabet_sizes):
            if sz > 1:
                codes.prefix_codes.append(
                    build_and_store_prefix_code(h[:sz].astype(np.int64), w))
            else:
                # Mirror of dec_ans.cc:212: no table stored for 1-symbol
                # alphabets.
                pc = PrefixCode([0], {}, degenerate_symbol=0)
                pc.depths = np.zeros(1, np.uint8)
                pc.bits = np.zeros(1, np.uint16)
                codes.prefix_codes.append(pc)
    else:
        codes.counts = []
        for h in clustered:
            nz = np.nonzero(h)[0]
            if len(nz) == 0:
                counts, omit = [ANS_TAB_SIZE], 0
            elif len(nz) == 1:
                counts = [0] * (int(nz[0]) + 1)
                counts[int(nz[0])] = ANS_TAB_SIZE
                omit = int(nz[0])
            else:
                raw = [int(c) for c in h[:int(nz[-1]) + 1]]
                counts, omit = normalize_counts(raw, shift=ANS_LOG_TAB_SIZE)
            write_histogram(counts, w, shift=ANS_LOG_TAB_SIZE, omit_pos=omit)
            codes.counts.append(counts)
        if not _native_encoder_tables(codes):
            _python_encoder_tables(codes)
    return codes


def _python_encoder_tables(codes: "EntropyCodes") -> None:
    codes.reverse_maps = []
    codes.alias_tables = []
    for counts in codes.counts:
        table = init_alias_table(counts, codes.log_alpha_size)
        codes.alias_tables.append(table)
        codes.reverse_maps.append(build_reverse_maps(table, len(counts)))


def _native_encoder_tables(codes: "EntropyCodes") -> bool:
    """One C call builds every clustered histogram's encoder reverse
    map in the packed (freqs, rmap, rmap_off) layout ans_write_tokens
    consumes (jxl_native.cpp ans_encoder_tables). alias_tables /
    reverse_maps stay None; SymbolReader materializes them lazily."""
    try:
        from libjxl_tpu.native.bindings import get_lib
        lib = get_lib()
    except Exception:
        return False
    if lib is None:
        return False
    import ctypes as C
    if not hasattr(lib, "_enc_tab_bound"):
        lib.ans_encoder_tables.restype = C.c_int
        lib.ans_encoder_tables.argtypes = [
            C.POINTER(C.c_int32), C.c_int, C.c_int, C.c_int,
            C.POINTER(C.c_uint32), C.POINTER(C.c_uint32)]
        lib._enc_tab_bound = True
    m = len(codes.counts)
    alpha = max(1, max(len(c) for c in codes.counts))
    counts2d = np.zeros((m, alpha), np.int32)
    for i, c in enumerate(codes.counts):
        counts2d[i, :len(c)] = c
    rmap = np.empty(m * ANS_TAB_SIZE, np.uint32)
    rmap_off = np.empty((m, alpha), np.uint32)
    rc = lib.ans_encoder_tables(
        counts2d.ctypes.data_as(C.POINTER(C.c_int32)), m, alpha,
        codes.log_alpha_size,
        rmap.ctypes.data_as(C.POINTER(C.c_uint32)),
        rmap_off.ctypes.data_as(C.POINTER(C.c_uint32)))
    if rc != 0:
        return False
    codes.enc_tables = (counts2d.astype(np.uint32), rmap, rmap_off, alpha)
    return True


def write_tokens(tokens, codes: EntropyCodes, w: BitWriter,
                 context_offset: int = 0) -> None:
    """WriteTokens (enc_ans.cc:1240-1330): ANS emits in reverse order.

    `tokens` is a list of Token or a (ctx, value) array pair."""
    ctx, val = stream_arrays(tokens)
    if len(ctx) and context_offset:
        ctx = ctx + context_offset

    if codes.use_prefix_code:
        if _native_prefix_write_tokens(ctx, val, codes, w):
            return
        for c, v in zip(ctx, val):
            histo = codes.context_map[c]
            tok, nbits, bits = codes.uint_configs[histo].encode(int(v))
            pc = codes.prefix_codes[histo]
            w.write(int(pc.depths[tok]), int(pc.bits[tok]))
            w.write(int(nbits), int(bits))
        return

    if _native_write_tokens(ctx, val, codes, w):
        return

    chunks: list[tuple[int, int]] = []  # (bits, nbits) reversed order
    enc = AnsEncoder()
    for i in range(len(ctx) - 1, -1, -1):
        histo = codes.context_map[int(ctx[i])]
        tok, nbits, bits = codes.uint_configs[histo].encode(int(val[i]))
        chunks.append((bits, nbits))
        freq = codes.counts[histo][tok]
        ans_bits, ans_nbits = enc.put_symbol(freq,
                                             codes.reverse_maps[histo][tok])
        chunks.append((ans_bits, ans_nbits))
    w.write(32, enc.state)
    for bits, nbits in reversed(chunks):
        w.write(nbits, bits)




_BITS_SCRATCH = [np.empty(1 << 16, np.uint8)]


def _bits_scratch(nbytes: int) -> np.ndarray:
    """Reusable output buffer for the native token emitters (BitSink
    overwrites bytes wholesale, so no zeroing is needed)."""
    if _BITS_SCRATCH[0].size < nbytes:
        _BITS_SCRATCH[0] = np.empty(
            max(nbytes, _BITS_SCRATCH[0].size * 2), np.uint8)
    return _BITS_SCRATCH[0]


def _native_write_tokens(ctx, val, codes: EntropyCodes, w: BitWriter) -> bool:
    try:
        from libjxl_tpu.native.bindings import get_lib
    except Exception:
        return False
    lib = get_lib()
    if lib is None or len(ctx) == 0:
        return False
    import ctypes as C

    n_clusters = codes.num_histograms
    packed = getattr(codes, "enc_tables", None)
    if packed is None:
        # Pack from the Python reverse maps once and cache.
        alpha = max(len(c) for c in codes.counts)
        freqs = np.zeros((n_clusters, alpha), np.uint32)
        rmap_parts = []
        rmap_off = np.zeros((n_clusters, alpha), np.uint32)
        off = 0
        for h in range(n_clusters):
            for t, cnt in enumerate(codes.counts[h]):
                rmap_off[h, t] = off
                freqs[h, t] = cnt
                if cnt > 0:
                    rmap_parts.append(codes.reverse_maps[h][t])
                    off += cnt
        rmap = np.concatenate(rmap_parts).astype(np.uint32) if rmap_parts \
            else np.zeros(1, np.uint32)
        codes.enc_tables = (freqs, rmap, rmap_off, alpha)
    freqs, rmap, rmap_off, alpha = codes.enc_tables
    cached_meta = getattr(codes, "_enc_meta", None)
    if cached_meta is None:
        cmap = np.array(codes.context_map, np.uint8)
        cfgs = np.array([[c.split_exponent, c.msb_in_token,
                          c.lsb_in_token]
                         for c in codes.uint_configs], np.int32)
        codes._enc_meta = (cmap, cfgs)
    cmap, cfgs = codes._enc_meta
    ctx32 = np.ascontiguousarray(ctx, np.int32)
    val32 = np.ascontiguousarray(val, np.uint32)
    cap_bits = 64 * len(ctx) + 4096
    out = _bits_scratch((cap_bits + 7) // 8)
    used = C.c_int64(0)
    rc = lib.ans_write_tokens(
        ctx32.ctypes.data_as(C.POINTER(C.c_int32)),
        val32.ctypes.data_as(C.POINTER(C.c_uint32)),
        len(ctx), cmap.ctypes.data_as(C.POINTER(C.c_uint8)),
        cfgs.ctypes.data_as(C.POINTER(C.c_int32)), n_clusters,
        freqs.ctypes.data_as(C.POINTER(C.c_uint32)),
        rmap.ctypes.data_as(C.POINTER(C.c_uint32)),
        rmap_off.ctypes.data_as(C.POINTER(C.c_uint32)), alpha,
        out.ctypes.data_as(C.POINTER(C.c_uint8)), cap_bits, C.byref(used))
    if rc != 0:
        return False
    # Append bit-exact: stream bits produced LSB-first in out.
    w.append_bits_lsb(out, used.value)
    return True


def _native_token_histogram_fn():
    """Returns fn(ctx, val, cfg, hist2d) -> max_token | negative, or
    None when the native lib is unavailable."""
    try:
        from libjxl_tpu.native.bindings import get_lib
    except Exception:
        return None
    lib = get_lib()
    if lib is None:
        return None
    import ctypes as C

    def run(ctx, val, cfg, hist2d):
        ctx32 = np.ascontiguousarray(ctx, np.int32)
        val32 = np.ascontiguousarray(val, np.uint32)
        return lib.token_histogram(
            ctx32.ctypes.data_as(C.POINTER(C.c_int32)),
            val32.ctypes.data_as(C.POINTER(C.c_uint32)), len(ctx32),
            cfg.split_exponent, cfg.msb_in_token, cfg.lsb_in_token,
            hist2d.ctypes.data_as(C.POINTER(C.c_int64)),
            hist2d.shape[0], hist2d.shape[1])
    return run


def _native_prefix_write_tokens(ctx, val, codes: EntropyCodes,
                                w: BitWriter) -> bool:
    """Forward prefix-code emission in C (the fast-lossless entropy
    backend; mirrors enc_fast_lossless.cc's prefix-over-ANS choice)."""
    try:
        from libjxl_tpu.native.bindings import get_lib
    except Exception:
        return False
    lib = get_lib()
    if lib is None or len(ctx) == 0:
        return False
    import ctypes as C

    n_clusters = codes.num_histograms
    cached = getattr(codes, "_prefix_native_luts", None)
    if cached is None:
        alpha = max(max(len(pc.depths) for pc in codes.prefix_codes), 1)
        depths = np.zeros((n_clusters, alpha), np.uint8)
        cbits = np.zeros((n_clusters, alpha), np.uint16)
        for h, pc in enumerate(codes.prefix_codes):
            if pc.depths is None:
                return False
            depths[h, :len(pc.depths)] = pc.depths
            cbits[h, :len(pc.bits)] = pc.bits
        cmap = np.array(codes.context_map, np.uint8)
        cfgs = np.array([[c.split_exponent, c.msb_in_token,
                          c.lsb_in_token] for c in codes.uint_configs],
                        np.int32)
        cached = (alpha, depths, cbits, cmap, cfgs)
        codes._prefix_native_luts = cached
    alpha, depths, cbits, cmap, cfgs = cached
    ctx32 = np.ascontiguousarray(ctx, np.int32)
    val32 = np.ascontiguousarray(val, np.uint32)
    cap_bits = 48 * len(ctx) + 4096
    out = _bits_scratch((cap_bits + 7) // 8)
    used = C.c_int64(0)
    rc = lib.prefix_write_tokens(
        ctx32.ctypes.data_as(C.POINTER(C.c_int32)),
        val32.ctypes.data_as(C.POINTER(C.c_uint32)),
        len(ctx), cmap.ctypes.data_as(C.POINTER(C.c_uint8)),
        cfgs.ctypes.data_as(C.POINTER(C.c_int32)), n_clusters,
        depths.ctypes.data_as(C.POINTER(C.c_uint8)),
        cbits.ctypes.data_as(C.POINTER(C.c_uint16)), alpha,
        out.ctypes.data_as(C.POINTER(C.c_uint8)), cap_bits, C.byref(used))
    if rc != 0:
        return False
    w.append_bits_lsb(out, used.value)
    return True


# ---------------------------------------------------------------------------
# LZ77 encoder (enc_ans.cc ApplyLZ77 + HybridUintConfig length coding)


def lz77_worth_trying(val: np.ndarray) -> bool:
    """Cheap vectorized repetition probe: distinct 4-gram ratio."""
    n = len(val)
    if n < 256:
        return False
    v = np.asarray(val, np.int64)
    h = (v[:-3] * 1000003 + v[1:-2] * 8191 + v[2:-1] * 131 + v[3:])
    uniq = len(np.unique(h))
    return uniq < 0.6 * len(h)


def _apply_lz77_native(ctx, v, distance_multiplier, min_length,
                       match_min):
    """Native hash-chain matcher. Returns False when the native lib is
    unavailable, else the same (ctx, val, is_len) | None contract as
    apply_lz77."""
    import ctypes as C

    try:
        from libjxl_tpu.native.bindings import get_lib
        lib = get_lib()
    except Exception:
        return False
    if lib is None:
        return False
    n = len(v)
    ctx64 = np.ascontiguousarray(ctx, np.int64)
    v64 = np.ascontiguousarray(v, np.int64)
    if distance_multiplier:
        special = np.array(
            [special_distance(i, distance_multiplier)
             for i in range(NUM_SPECIAL_DISTANCES)], np.int64)
    else:
        special = np.zeros(1, np.int64)
    out_ctx = np.empty(n + 2, np.int64)
    out_val = np.empty(n + 2, np.int64)
    out_len = np.empty(n + 2, np.uint8)
    p = C.POINTER(C.c_int64)
    m = lib.lz77_match(
        ctx64.ctypes.data_as(p), v64.ctypes.data_as(p), n,
        special.ctypes.data_as(p),
        NUM_SPECIAL_DISTANCES if distance_multiplier else 0,
        min_length, match_min,
        out_ctx.ctypes.data_as(p), out_val.ctypes.data_as(p),
        out_len.ctypes.data_as(C.POINTER(C.c_uint8)))
    if m <= 0:
        return None
    return out_ctx[:m], out_val[:m], out_len[:m]


def apply_lz77(ctx: np.ndarray, val: np.ndarray,
               distance_multiplier: int = 0, min_length: int = 3,
               match_min: int = 4) -> tuple | None:
    """Greedy hash-chain matcher over token VALUES. Returns
    (ctx, val, is_len) arrays with matches replaced by length tokens
    (value = copy length) followed by a distance token in the virtual
    distance context (ctx = -1), or None when no worthwhile matches."""
    n = len(val)
    if n < 32:
        return None
    v = np.asarray(val, np.int64)
    native = _apply_lz77_native(ctx, v, distance_multiplier,
                                min_length, match_min)
    if native is not False:
        return native
    num_special = NUM_SPECIAL_DISTANCES if distance_multiplier else 0
    special_lut = {}
    if num_special:
        for i in range(NUM_SPECIAL_DISTANCES):
            d = special_distance(i, distance_multiplier)
            special_lut.setdefault(d, i)

    out_ctx: list = []
    out_val: list = []
    out_len: list = []
    heads: dict = {}
    prev = np.full(n, -1, np.int64)

    def key(i):
        return (int(v[i]), int(v[i + 1]), int(v[i + 2]))

    i = 0
    matched = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + 3 <= n:
            cand = heads.get(key(i), -1)
            tries = 0
            while cand >= 0 and tries < 16:
                # extend match
                length = 0
                limit = n - i
                while length < limit and v[cand + length] == v[i + length] \
                        and length < 65536:
                    # allow overlapping copies (cand+length may reach i)
                    length += 1
                if length > best_len:
                    best_len = length
                    best_dist = i - cand
                cand = int(prev[cand])
                tries += 1
        if best_len >= max(min_length, match_min):
            out_ctx.append(int(ctx[i]))
            out_val.append(best_len)
            out_len.append(1)
            raw = special_lut.get(best_dist)
            if raw is None:
                raw = best_dist - 1 + num_special
            out_ctx.append(-1)
            out_val.append(raw)
            out_len.append(0)
            end = i + best_len
            while i < end:
                if i + 3 <= n:
                    k = key(i)
                    prev[i] = heads.get(k, -1)
                    heads[k] = i
                i += 1
            matched += best_len
        else:
            out_ctx.append(int(ctx[i]))
            out_val.append(int(v[i]))
            out_len.append(0)
            if i + 3 <= n:
                k = key(i)
                prev[i] = heads.get(k, -1)
                heads[k] = i
            i += 1
    if matched < n // 20:  # <5% coverage: not worth the histogram cost
        return None
    return (np.array(out_ctx, np.int64), np.array(out_val, np.int64),
            np.array(out_len, np.uint8))


def build_and_encode_histograms_lz77(
        num_contexts: int, lz_streams: list, w: BitWriter, *,
        uint_config: HybridUintConfig | None = None,
        max_clusters: int = 64) -> EntropyCodes:
    """Histogram build/encode for streams produced by apply_lz77.

    lz_streams: list of (ctx, val, is_len) triples; distance tokens use
    ctx == -1 (mapped to the extra distance context)."""
    uint_config = uint_config or HybridUintConfig(4, 2, 0)
    lz77 = LZ77Params(enabled=True)
    lz77.length_uint_config = HybridUintConfig(1, 0, 0)
    lz77.write(w)
    write_uint_config(lz77.length_uint_config, w, 8)

    total = num_contexts + 1  # + distance context
    histograms = [np.zeros(ANS_MAX_ALPHABET_SIZE, np.int64)
                  for _ in range(total)]
    max_token = 0
    for (ctx, val, is_len) in lz_streams:
        ctx = np.where(ctx < 0, num_contexts, ctx)
        plain = is_len == 0
        if plain.any():
            toks, _, _ = uint_config.encode_np(val[plain])
            if toks.max() >= lz77.min_symbol:
                raise BitstreamError("plain token collides with LZ77")
            h2 = np.zeros((total, ANS_MAX_ALPHABET_SIZE), np.int64)
            np.add.at(h2, (ctx[plain], toks.astype(np.int64)), 1)
            for c in range(total):
                histograms[c] += h2[c]
            max_token = max(max_token, int(toks.max()))
        for j in np.nonzero(is_len)[0]:
            ltok, _, _ = lz77.length_uint_config.encode(
                int(val[j]) - lz77.min_length)
            sym = lz77.min_symbol + ltok
            if sym >= ANS_MAX_ALPHABET_SIZE:
                raise BitstreamError("LZ77 length token too large")
            histograms[int(ctx[j])][sym] += 1
            max_token = max(max_token, sym)
    return _finish_histograms(histograms, total, w, False, uint_config,
                              max_token, lz77, max_clusters)


def write_tokens_lz77(lz_stream: tuple, codes: EntropyCodes,
                      w: BitWriter) -> None:
    """write_tokens for an apply_lz77 stream (pure-python ANS path)."""
    ctx, val, is_len = lz_stream
    if codes.reverse_maps is None and codes.counts is not None:
        _python_encoder_tables(codes)   # native enc_tables path skips these
    num_contexts = len(codes.context_map) - 1
    chunks: list[tuple[int, int]] = []
    enc = AnsEncoder()
    lcfg = codes.lz77.length_uint_config
    for i in range(len(ctx) - 1, -1, -1):
        c = int(ctx[i])
        if c < 0:
            c = num_contexts
        histo = codes.context_map[c]
        if is_len[i]:
            ltok, nbits, bits = lcfg.encode(int(val[i])
                                            - codes.lz77.min_length)
            tok = codes.lz77.min_symbol + ltok
        else:
            tok, nbits, bits = codes.uint_configs[histo].encode(
                int(val[i]))
        chunks.append((bits, nbits))
        freq = codes.counts[histo][tok]
        ans_bits, ans_nbits = enc.put_symbol(freq,
                                             codes.reverse_maps[histo][tok])
        chunks.append((ans_bits, ans_nbits))
    w.write(32, enc.state)
    for bits, nbits in reversed(chunks):
        w.write(nbits, bits)


def stream_bits_proxy(ctx: np.ndarray, val: np.ndarray,
                      is_len: np.ndarray | None = None,
                      num_contexts: int = 0,
                      uint_config: HybridUintConfig | None = None) -> float:
    """Estimated coded size in bits: per-context token entropy plus raw
    mantissa bits (used to decide whether LZ77 pays off)."""
    if len(val) == 0:
        return 0.0
    uint_config = uint_config or HybridUintConfig(4, 2, 0)
    ctx = np.asarray(ctx, np.int64)
    nc = num_contexts or int(ctx.max()) + 2
    ctx = np.where(ctx < 0, nc - 1, ctx)
    toks, nbits, _ = uint_config.encode_np(np.asarray(val, np.int64))
    if is_len is not None:
        # Length tokens: distinct symbol space; approximate with a
        # shifted token id + ~6 raw bits each.
        toks = np.where(is_len > 0, 224 + np.minimum(toks, 30), toks)
        nbits = np.where(is_len > 0, 6, nbits)
    comb = ctx * 512 + np.minimum(toks, 511)
    counts = np.bincount(comb)
    counts = counts[counts > 0]
    p = counts / counts.sum()
    return float(-(counts * np.log2(p)).sum()) + float(nbits.sum())


def build_chunk_codes(num_contexts: int, token_streams: list,
                      uint_config: HybridUintConfig | None = None,
                      log_alpha_size: int = 8,
                      max_clusters: int = 64):
    """Streaming-encode helper: cluster one chunk's token histograms and
    build writable codes WITHOUT emitting the histogram set (the
    combined ACGlobal is assembled later; enc_frame.cc:1252 "in
    streaming mode, this function only performs the histogram
    clustering"). Returns (codes, context_map_local, normalized_counts).
    """
    uint_config = uint_config or HybridUintConfig(4, 2, 0)
    histograms = [np.zeros(ANS_MAX_ALPHABET_SIZE, np.int64)
                  for _ in range(num_contexts)]
    hist2d = np.zeros((num_contexts, ANS_MAX_ALPHABET_SIZE), np.int64)
    max_token = 0
    for stream in token_streams:
        ctx, val = stream_arrays(stream)
        if len(val) == 0:
            continue
        toks, _, _ = uint_config.encode_np(val)
        if toks.max() >= ANS_MAX_ALPHABET_SIZE:
            raise BitstreamError("token exceeds ANS alphabet")
        np.add.at(hist2d, (ctx, toks.astype(np.int64)), 1)
        max_token = max(max_token, int(toks.max()))
    for c in range(num_contexts):
        histograms[c] += hist2d[c]
    if (1 << log_alpha_size) <= max_token:
        raise BitstreamError("token exceeds forced alphabet size")
    scratch = BitWriter()
    lz77 = LZ77Params(enabled=False)
    codes = _finish_histograms(histograms, num_contexts, scratch, False,
                               uint_config, max_token, lz77, max_clusters,
                               force_log_alpha=log_alpha_size)
    return codes, list(codes.context_map), list(codes.counts)


def write_histogram_sets(w: BitWriter, context_maps: list,
                         counts_sets: list,
                         uint_config: HybridUintConfig | None = None,
                         log_alpha_size: int = 8) -> None:
    """Emit the combined ACGlobal histogram structure for per-chunk
    clustered sets: chunk c's contexts map to its own clusters
    (offset-shifted), followed by every cluster's normalized counts."""
    from libjxl_tpu.entropy.context_map import encode_context_map
    uint_config = uint_config or HybridUintConfig(4, 2, 0)
    lz77 = LZ77Params(enabled=False)
    lz77.write(w)
    global_map = []
    offset = 0
    all_counts = []
    for cm, counts in zip(context_maps, counts_sets):
        global_map.extend(offset + m for m in cm)
        all_counts.extend(counts)
        offset += len(counts)
    encode_context_map(global_map, len(all_counts), w)
    w.write_bool(False)              # ANS, not prefix
    w.write(2, log_alpha_size - 5)
    for _ in all_counts:
        write_uint_config(uint_config, w, log_alpha_size)
    for counts in all_counts:
        nz = [i for i, v in enumerate(counts) if v]
        if len(nz) <= 1:
            omit = nz[0] if nz else 0
        else:
            omit = int(np.argmax(counts))
        write_histogram(counts, w, shift=ANS_LOG_TAB_SIZE, omit_pos=omit)
