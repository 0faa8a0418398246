"""rANS core: histogram (de)serialization, alias tables, state machines.

Reference: lib/jxl/ans_params.h (constants), dec_ans.cc (ReadHistogram,
DecodeVarLenUint8/16, alias-table decode), ans_common.cc (InitAliasTable),
enc_ans.h (ANSCoder), enc_ans.cc (ANSEncodingHistogram::Encode,
StoreVarLenUint8/16, normalization).

The 32-bit rANS state renormalizes 16 bits at a time against the
bitstream; 12-bit tables (`ANS_LOG_TAB_SIZE`); per-histogram alias
tables allow O(1) symbol lookup with alphabet sizes up to 256.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter

ANS_LOG_TAB_SIZE = 12
ANS_TAB_SIZE = 1 << ANS_LOG_TAB_SIZE
ANS_TAB_MASK = ANS_TAB_SIZE - 1
ANS_SIGNATURE = 0x13
ANS_MAX_ALPHABET_SIZE = 256
PREFIX_MAX_BITS = 15
PREFIX_MAX_ALPHABET_SIZE = 4096


def floor_log2(v: int) -> int:
    return v.bit_length() - 1


def ceil_log2(v: int) -> int:
    return (v - 1).bit_length() if v > 1 else 0


# ---------------------------------------------------------------------------
# Hybrid uint (token <-> value) — dec_ans.h:68-103


@dataclasses.dataclass(frozen=True)
class HybridUintConfig:
    split_exponent: int = 4
    msb_in_token: int = 2
    lsb_in_token: int = 0

    @property
    def split_token(self) -> int:
        return 1 << self.split_exponent

    def encode(self, value: int) -> tuple[int, int, int]:
        """value -> (token, nbits, bits)."""
        if value < self.split_token:
            return value, 0, 0
        n = floor_log2(value)
        m = value - (1 << n)
        token = (self.split_token
                 + ((n - self.split_exponent) << (self.msb_in_token + self.lsb_in_token))
                 + ((m >> (n - self.msb_in_token)) << self.lsb_in_token)
                 + (m & ((1 << self.lsb_in_token) - 1)))
        nbits = n - self.msb_in_token - self.lsb_in_token
        bits = (value >> self.lsb_in_token) & ((1 << nbits) - 1)
        return token, nbits, bits

    def read(self, token: int, br: BitReader) -> int:
        """token + extra bits from br -> value (dec_ans.h:226-257)."""
        if token < self.split_token:
            return token
        mt = self.msb_in_token + self.lsb_in_token
        nbits = (self.split_exponent - mt + ((token - self.split_token) >> mt)) & 31
        low = token & ((1 << self.lsb_in_token) - 1)
        token >>= self.lsb_in_token
        bits = br.read(nbits)
        msb_part = (1 << self.msb_in_token) | (token & ((1 << self.msb_in_token) - 1))
        return (((msb_part << nbits) | bits) << self.lsb_in_token) | low

    def encode_np(self, values: np.ndarray):
        """Vectorized encode: values -> (tokens, nbits, bits) arrays."""
        v = np.asarray(values, np.int64)
        small = v < self.split_token
        # floor_log2 via bit_length equivalent
        safe = np.maximum(v, 1)
        n = np.floor(np.log2(safe)).astype(np.int64)
        # correct any fp edge cases
        n = np.where((1 << (n + 1)) <= safe, n + 1, n)
        n = np.where((1 << n) > safe, n - 1, n)
        m = v - (1 << n)
        mt = self.msb_in_token + self.lsb_in_token
        token = (self.split_token
                 + ((n - self.split_exponent) << mt)
                 + ((m >> np.maximum(n - self.msb_in_token, 0))
                    << self.lsb_in_token)
                 + (m & ((1 << self.lsb_in_token) - 1)))
        nbits = n - mt
        bits = (v >> self.lsb_in_token) & ((1 << np.maximum(nbits, 0)) - 1)
        return (np.where(small, v, token),
                np.where(small, 0, nbits),
                np.where(small, 0, bits))

    def max_token_bits(self, token: int) -> int:
        """Bits needed for values this token can produce (UpdateMaxNumBits)."""
        if token < self.split_token:
            return self.split_exponent
        mt = self.msb_in_token + self.lsb_in_token
        n_extra = self.split_exponent - mt + ((token - self.split_token) >> mt)
        return mt + n_extra + 1


# ---------------------------------------------------------------------------
# VarLenUint8 / VarLenUint16 (dec_ans.cc:33-56, enc_ans.cc:54-77)


def read_varlen_u8(r: BitReader) -> int:
    if r.read(1):
        nbits = r.read(3)
        if nbits == 0:
            return 1
        return r.read(nbits) + (1 << nbits)
    return 0


def write_varlen_u8(n: int, w: BitWriter) -> None:
    assert 0 <= n <= 255
    if n == 0:
        w.write(1, 0)
    else:
        w.write(1, 1)
        nbits = floor_log2(n)
        w.write(3, nbits)
        w.write(nbits, n - (1 << nbits))


def read_varlen_u16(r: BitReader) -> int:
    if r.read(1):
        nbits = r.read(4)
        if nbits == 0:
            return 1
        return r.read(nbits) + (1 << nbits)
    return 0


def write_varlen_u16(n: int, w: BitWriter) -> None:
    assert 0 <= n <= 65535
    if n == 0:
        w.write(1, 0)
    else:
        w.write(1, 1)
        nbits = floor_log2(n)
        w.write(4, nbits)
        w.write(nbits, n - (1 << nbits))


# ---------------------------------------------------------------------------
# Histogram count (de)serialization


def get_population_count_precision(logcount: int, shift: int) -> int:
    """ans_common.h:26-33."""
    r = min(logcount, shift - ((ANS_LOG_TAB_SIZE - logcount) >> 1))
    return max(r, 0)


def create_flat_histogram(length: int, total: int) -> list[int]:
    count = total // length
    result = [count] * length
    for i in range(total % length):
        result[i] += 1
    return result


# 7-bit-peek decode table for count bit widths (dec_ans.cc:108-125):
# maps peeked 7 bits -> (consumed bits, logcount+1). The canonical code
# itself is a format constant; encoder uses _BIT_WIDTH_CODE below.
_BIT_WIDTH_LENGTHS = [5, 4, 4, 4, 4, 4, 3, 3, 3, 3, 3, 6, 7, 7]
_BIT_WIDTH_SYMBOLS = [17, 11, 15, 3, 9, 7, 4, 2, 5, 6, 0, 33, 1, 65]


def _build_bit_width_decode_table() -> list[tuple[int, int]]:
    table = [(0, 0)] * 128
    for value, (length, code) in enumerate(
            zip(_BIT_WIDTH_LENGTHS, _BIT_WIDTH_SYMBOLS)):
        # LSB-first: all 7-bit peeks whose low `length` bits equal `code`.
        for high in range(1 << (7 - length)):
            table[code | (high << length)] = (length, value)
    return table


_BIT_WIDTH_DECODE = _build_bit_width_decode_table()


def read_histogram(precision_bits: int, r: BitReader) -> list[int]:
    """dec_ans.cc:58-191 ReadHistogram."""
    rng = 1 << precision_bits
    if r.read(1):  # simple code
        num_symbols = r.read(1) + 1
        symbols = [read_varlen_u8(r) for _ in range(num_symbols)]
        counts = [0] * (max(symbols) + 1)
        if num_symbols == 1:
            counts[symbols[0]] = rng
        else:
            if symbols[0] == symbols[1]:
                raise BitstreamError("duplicate symbol in simple histogram")
            counts[symbols[0]] = r.read(precision_bits)
            counts[symbols[1]] = rng - counts[symbols[0]]
        return counts

    if r.read(1):  # flat
        alphabet_size = read_varlen_u8(r) + 1
        if alphabet_size > rng:
            raise BitstreamError("flat histogram alphabet too large")
        return create_flat_histogram(alphabet_size, rng)

    # general: Elias-gamma-ish shift, then huffman-coded log counts
    upper_bound_log = floor_log2(ANS_LOG_TAB_SIZE + 1)
    log = 0
    while log < upper_bound_log:
        if r.read(1) == 0:
            break
        log += 1
    shift = (r.read(log) | (1 << log)) - 1
    if shift > ANS_LOG_TAB_SIZE + 1:
        raise BitstreamError("invalid histogram shift")

    length = read_varlen_u8(r) + 3
    counts = [0] * length
    logcounts = [0] * length
    same = [0] * length
    omit_log, omit_pos = -1, -1
    i = 0
    while i < length:
        idx = r.peek(7)
        consumed, val = _BIT_WIDTH_DECODE[idx]
        r.skip(consumed)
        logcounts[i] = val - 1
        if logcounts[i] == ANS_LOG_TAB_SIZE:  # RLE symbol
            rle_length = read_varlen_u8(r)
            same[i] = rle_length + 5
            i += rle_length + 4
            continue
        if logcounts[i] > omit_log:
            omit_log = logcounts[i]
            omit_pos = i
        i += 1
    if omit_pos < 0:
        raise BitstreamError("invalid histogram (no omit position)")
    if omit_pos + 1 < length and logcounts[omit_pos + 1] == ANS_LOG_TAB_SIZE:
        raise BitstreamError("invalid histogram (RLE after omit)")

    total_count = 0
    prev = 0
    numsame = 0
    for i in range(length):
        if same[i]:
            numsame = same[i] - 1
            prev = counts[i - 1] if i > 0 else 0
        if numsame > 0:
            counts[i] = prev
            numsame -= 1
        else:
            code = logcounts[i]
            if i == omit_pos or code < 0:
                continue
            elif shift == 0 or code == 0:
                counts[i] = 1 << code
            else:
                bitcount = get_population_count_precision(code, shift)
                counts[i] = (1 << code) + (r.read(bitcount) << (code - bitcount))
        total_count += counts[i]
    counts[omit_pos] = rng - total_count
    if counts[omit_pos] <= 0:
        raise BitstreamError("invalid histogram count sum")
    return counts


def _smallest_increment_log(count: int, shift: int) -> int:
    if count == 0:
        return 0
    bits = floor_log2(count)
    return bits - get_population_count_precision(bits, shift)


def normalize_counts(raw: list[int], shift: int) -> tuple[list[int], int]:
    """Normalize raw counts to sum ANS_TAB_SIZE, representable at `shift`.

    Simpler than the reference's greedy entropy rebalancer
    (enc_ans.cc:416-560) but produces valid histograms of the same
    format: every non-omitted count is a multiple of its smallest
    increment, the omitted (balancing) position holds the remainder.
    Returns (counts, omit_pos).
    """
    total = sum(raw)
    assert total > 0
    n = len(raw)
    counts = [0] * n
    # Largest raw count becomes the balancing bin.
    omit_pos = max(range(n), key=lambda i: (raw[i], -i))
    norm = ANS_TAB_SIZE / total
    rest = ANS_TAB_SIZE
    for i in range(n):
        if i == omit_pos or raw[i] == 0:
            continue
        target = max(1, round(raw[i] * norm))
        target = min(target, ANS_TAB_SIZE - 1)
        inc = 1 << _smallest_increment_log(target, shift)
        target &= ~(inc - 1)
        if target == 0:
            target = 1
        counts[i] = target
        rest -= target
    if rest <= 0:
        # Shrink the biggest non-omit bins until the balancing bin is
        # positive. Halving keeps representability.
        order = sorted((i for i in range(n) if i != omit_pos and counts[i] > 1),
                       key=lambda i: -counts[i])
        while rest <= 0:
            progressed = False
            for i in order:
                if counts[i] > 1:
                    half = counts[i] // 2
                    inc = 1 << _smallest_increment_log(half, shift)
                    half &= ~(inc - 1)
                    half = max(half, 1)
                    rest += counts[i] - half
                    counts[i] = half
                    progressed = True
                    if rest > 0:
                        break
            if not progressed:
                raise BitstreamError("cannot normalize histogram")
    counts[omit_pos] = rest
    return counts, omit_pos


def write_histogram(counts: list[int], w: BitWriter, shift: int = 12,
                    omit_pos: int | None = None) -> None:
    """Serialize normalized counts (sum == ANS_TAB_SIZE).

    Mirrors ANSEncodingHistogram::Encode (enc_ans.cc:198-330): simple
    code for <=2 symbols, otherwise general code with the static
    bit-width prefix code + RLE. `shift` and `omit_pos` must match the
    quantization the counts were normalized with (normalize_counts):
    every count except counts[omit_pos] must be representable at shift.
    """
    nonzero = [i for i, c in enumerate(counts) if c > 0]
    alphabet_size = (nonzero[-1] + 1) if nonzero else 0

    if len(nonzero) <= 2:
        # small tree
        w.write(1, 1)
        if not nonzero:
            w.write(1, 0)
            write_varlen_u8(0, w)
            return
        w.write(1, len(nonzero) - 1)
        for s in nonzero:
            write_varlen_u8(s, w)
        if len(nonzero) == 2:
            w.write(ANS_LOG_TAB_SIZE, counts[nonzero[0]])
        return

    # general tree
    w.write(1, 0)  # not small
    w.write(1, 0)  # not flat
    method = min(shift, ANS_LOG_TAB_SIZE - 1) + 1
    upper_bound_log = floor_log2(ANS_LOG_TAB_SIZE + 1)
    log = floor_log2(method)
    w.write(log, (1 << log) - 1)
    if log != upper_bound_log:
        w.write(1, 0)
    w.write(log, ((1 << log) - 1) & method)
    write_varlen_u8(alphabet_size - 3, w)

    # The written bit width at omit_pos is inflated so the decoder's
    # "first strictly-largest logcount" rule (dec_ans.cc:144-147) lands
    # exactly on it, whatever position the normalizer balanced on.
    shift_used = method - 1
    if omit_pos is None:
        omit_pos = _find_omit_pos(counts, alphabet_size, shift_used)

    # RLE runs (not across omit_pos).
    same = [0] * (alphabet_size + 1)
    last = 0
    for i in range(1, alphabet_size + 1):
        if (i == alphabet_size or i == omit_pos or i == omit_pos + 1
                or counts[i] != counts[last]):
            same[last] = i - last
            last = i

    bit_width = [0] * alphabet_size
    omit_width = 10
    for i in range(alphabet_size):
        if i != omit_pos and counts[i] > 0:
            bit_width[i] = floor_log2(counts[i]) + 1
            omit_width = max(omit_width, bit_width[i] + (1 if i < omit_pos else 0))
    bit_width[omit_pos] = omit_width

    MIN_REPS = 5
    REP = ANS_LOG_TAB_SIZE + 1
    i = 0
    while i < alphabet_size:
        bw = bit_width[i]
        w.write(_BIT_WIDTH_LENGTHS[bw], _BIT_WIDTH_SYMBOLS[bw])
        if same[i] >= MIN_REPS:
            w.write(_BIT_WIDTH_LENGTHS[REP], _BIT_WIDTH_SYMBOLS[REP])
            write_varlen_u8(same[i] - MIN_REPS, w)
            i += same[i]
        else:
            i += 1

    if shift_used != 0:
        i = 0
        while i < alphabet_size:
            if bit_width[i] > 1 and i != omit_pos:
                bitcount = get_population_count_precision(bit_width[i] - 1,
                                                          shift_used)
                drop_bits = bit_width[i] - 1 - bitcount
                if counts[i] & ((1 << drop_bits) - 1):
                    raise BitstreamError("count not representable at shift")
                w.write(bitcount, (counts[i] >> drop_bits) - (1 << bitcount))
            if same[i] >= MIN_REPS:
                i += same[i]
            else:
                i += 1


def _find_omit_pos(counts: list[int], alphabet_size: int, shift: int) -> int:
    """First position with max logcount (decoder's omit rule)."""
    best_log, best_pos = -1, -1
    for i in range(alphabet_size):
        if counts[i] > 0:
            lg = floor_log2(counts[i])
            if lg > best_log:
                best_log, best_pos = lg, i
    return best_pos


# ---------------------------------------------------------------------------
# Alias table (ans_common.cc:42-146)


@dataclasses.dataclass
class AliasTable:
    """Vectorized alias table: per 12-bit slot res, the decode triple.

    Instead of the reference's per-entry compact struct we expand to
    three flat uint arrays of size ANS_TAB_SIZE indexed by `res`
    directly — O(4096) memory per histogram but branch-free lookups and
    trivially reusable for building numpy-vectorized decode loops.
    """
    value: np.ndarray   # uint16[4096] symbol
    offset: np.ndarray  # uint16[4096] occurrence index of symbol
    freq: np.ndarray    # uint16[4096] frequency of symbol


def init_alias_table(distribution: list[int], log_alpha_size: int) -> AliasTable:
    dist = list(distribution)
    while dist and dist[-1] == 0:
        dist.pop()
    if not dist:
        dist = [ANS_TAB_SIZE]
    table_size = 1 << log_alpha_size
    if len(dist) > table_size:
        raise BitstreamError("alphabet larger than alias table")
    if sum(dist) != ANS_TAB_SIZE:
        raise BitstreamError("histogram does not sum to table size")
    entry_size = ANS_TAB_SIZE >> log_alpha_size

    value = np.zeros(ANS_TAB_SIZE, np.uint16)
    offset = np.zeros(ANS_TAB_SIZE, np.uint16)
    freq = np.zeros(ANS_TAB_SIZE, np.uint16)

    # Single-symbol special case keeps state unchanged (ans_common.cc:59-85):
    # freq = ANS_TAB_SIZE, offset = res, so decode is the identity.
    for sym, v in enumerate(dist):
        if v == ANS_TAB_SIZE:
            value[:] = sym
            offset[:] = np.arange(ANS_TAB_SIZE, dtype=np.uint16)
            return AliasTable(
                value=value, offset=offset,
                freq=np.full(ANS_TAB_SIZE, ANS_TAB_SIZE, np.uint32))

    cutoffs = [0] * table_size
    right_value = [0] * table_size
    offsets1 = [0] * table_size
    underfull: list[int] = []
    overfull: list[int] = []
    for i in range(len(dist)):
        cutoffs[i] = dist[i]
        if cutoffs[i] > entry_size:
            overfull.append(i)
        elif cutoffs[i] < entry_size:
            underfull.append(i)
    for i in range(len(dist), table_size):
        cutoffs[i] = 0
        underfull.append(i)

    while overfull:
        oi = overfull.pop()
        ui = underfull.pop()
        by = entry_size - cutoffs[ui]
        cutoffs[oi] -= by
        right_value[ui] = oi
        offsets1[ui] = cutoffs[oi]
        if cutoffs[oi] < entry_size:
            underfull.append(oi)
        elif cutoffs[oi] > entry_size:
            overfull.append(oi)

    final_cutoff = [0] * table_size
    for i in range(table_size):
        if cutoffs[i] == entry_size:
            right_value[i] = i
            offsets1[i] = 0
            final_cutoff[i] = 0
        else:
            offsets1[i] -= cutoffs[i]
            final_cutoff[i] = cutoffs[i]

    dist_arr = np.array(dist + [0] * (table_size - len(dist)), np.int64)
    idx = np.arange(ANS_TAB_SIZE, dtype=np.int64)
    slot = idx >> (ANS_LOG_TAB_SIZE - log_alpha_size)
    pos = idx & (entry_size - 1)
    rv = np.asarray(right_value, np.int64)[slot]
    use_right = pos >= np.asarray(final_cutoff, np.int64)[slot]
    sym = np.where(use_right, rv, slot)
    value = sym.astype(np.uint16)
    offset = np.where(use_right,
                      np.asarray(offsets1, np.int64)[slot] + pos,
                      pos).astype(np.uint16)
    freq = dist_arr[sym]
    return AliasTable(value=value, offset=offset,
                      freq=freq.astype(np.uint32))


# ---------------------------------------------------------------------------
# ANS state machines


class AnsState:
    """Decoder state (ANSSymbolReader core, dec_ans.h:170-197)."""

    __slots__ = ("state",)

    def __init__(self, br: BitReader):
        self.state = br.read(32)

    def read_symbol(self, table: AliasTable, br: BitReader) -> int:
        res = self.state & ANS_TAB_MASK
        sym = int(table.value[res])
        self.state = int(table.freq[res]) * (self.state >> ANS_LOG_TAB_SIZE) \
            + int(table.offset[res])
        if self.state < (1 << 16):
            self.state = (self.state << 16) | br.read(16)
        return sym

    def check_final_state(self) -> bool:
        return self.state == (ANS_SIGNATURE << 16)


class AnsEncoder:
    """Encoder state (enc_ans.h:49-77). Symbols pushed in REVERSE order;
    emitted bit chunks must then be written reversed (see write_tokens)."""

    __slots__ = ("state",)

    def __init__(self):
        self.state = ANS_SIGNATURE << 16

    def put_symbol(self, freq: int, reverse_map: np.ndarray) -> tuple[int, int]:
        """Returns (bits, nbits) to emit BEFORE earlier-emitted bits."""
        bits, nbits = 0, 0
        if (self.state >> (32 - ANS_LOG_TAB_SIZE)) >= freq:
            bits = self.state & 0xFFFF
            nbits = 16
            self.state >>= 16
        self.state = ((self.state // freq) << ANS_LOG_TAB_SIZE) \
            + int(reverse_map[self.state % freq])
        return bits, nbits


def build_reverse_maps(table: AliasTable, alphabet_size: int) -> list[np.ndarray]:
    """reverse_map[sym][offset] = res, for the encoder (ANSBuildInfoTable)."""
    maps: list[np.ndarray] = []
    for s in range(max(alphabet_size, 1)):
        res = np.nonzero(table.value == s)[0]
        m = np.zeros(len(res), np.uint32)
        m[table.offset[res]] = res
        maps.append(m)
    return maps
