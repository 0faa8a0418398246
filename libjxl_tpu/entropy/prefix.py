"""Brotli-style prefix (Huffman) codes — the alternative to rANS.

Reference: lib/jxl/dec_huffman.cc (ReadFromBitStream, ReadSimpleCode,
ReadHuffmanCodeLengths), huffman_table.cc (canonical assignment),
enc_huffman.cc (BuildAndStoreHuffmanTree, StoreHuffmanTree).

Codewords are canonical (assigned by increasing length, ties by symbol
index) and transmitted starting from the code's most significant bit —
the reference stores bit-reversed keys because its reader is LSB-first;
here we decode by accumulating bits MSB-first into a (length, code)
dictionary, which matches the same bitstream.
"""

from __future__ import annotations

import dataclasses
import heapq

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter

PREFIX_MAX_BITS = 15
_CODE_LENGTH_CODES = 18
_CODE_LENGTH_CODE_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12,
                           13, 14, 15]
_DEFAULT_CODE_LENGTH = 8
_REPEAT_PREVIOUS = 16  # 2 extra bits, 3-6 reps of previous nonzero length
_REPEAT_ZERO = 17      # 3 extra bits, 3-10 reps of zero

# Static code for the code-length-code lengths (dec_huffman.cc:215-218):
# symbol -> (bits value to write LSB-first, bit count). From
# enc_huffman.cc:37-41 kHuffmanBitLengthHuffmanCode{Symbols,BitLengths}.
_CLCL_CODE = {0: (0, 2), 1: (7, 4), 2: (3, 3), 3: (2, 2), 4: (1, 2),
              5: (15, 4)}


def _clcl_read(r: BitReader) -> int:
    """Read one code-length-code length via the static 4-bit peek table."""
    # Table from dec_huffman.cc:215-218: 16 entries (bits, value).
    table = [(2, 0), (2, 4), (2, 3), (3, 2), (2, 0), (2, 4), (2, 3), (4, 1),
             (2, 0), (2, 4), (2, 3), (3, 2), (2, 0), (2, 4), (2, 3), (4, 5)]
    idx = r.peek(4)
    bits, value = table[idx]
    r.skip(bits)
    return value


def canonical_code_table(code_lengths: list[int]) -> dict[tuple[int, int], int]:
    """(length, canonical code) -> symbol."""
    order = sorted((length, sym) for sym, length in enumerate(code_lengths)
                   if length > 0)
    table: dict[tuple[int, int], int] = {}
    code = 0
    prev_len = order[0][0] if order else 0
    for length, sym in order:
        code <<= (length - prev_len)
        table[(length, code)] = sym
        code += 1
        prev_len = length
    return table


@dataclasses.dataclass
class PrefixCode:
    code_lengths: list[int]
    table: dict[tuple[int, int], int]
    degenerate_symbol: int | None  # set when a single symbol has length 0
    # encoder fields (canonical code per symbol, bit-reversed for writing)
    depths: np.ndarray | None = None
    bits: np.ndarray | None = None

    def read_symbol(self, r: BitReader) -> int:
        if self.degenerate_symbol is not None:
            return self.degenerate_symbol
        acc = 0
        for length in range(1, PREFIX_MAX_BITS + 1):
            acc = (acc << 1) | r.read(1)
            sym = self.table.get((length, acc))
            if sym is not None:
                return sym
        raise BitstreamError("invalid prefix code word")


def _build_from_lengths(code_lengths: list[int]) -> PrefixCode:
    nonzero = [s for s, l in enumerate(code_lengths) if l > 0]
    if len(nonzero) <= 1:
        sym = nonzero[0] if nonzero else 0
        return PrefixCode(code_lengths, {}, degenerate_symbol=sym)
    # Kraft check: must be complete.
    space = sum(1 << (PREFIX_MAX_BITS - l) for l in code_lengths if l)
    if space != (1 << PREFIX_MAX_BITS):
        raise BitstreamError("prefix code lengths not complete")
    return PrefixCode(code_lengths, canonical_code_table(code_lengths), None)


def _read_simple_code(alphabet_size: int, r: BitReader) -> PrefixCode:
    """dec_huffman.cc ReadSimpleCode."""
    max_bits = (alphabet_size - 1).bit_length() if alphabet_size > 1 else 0
    num_symbols = r.read(2) + 1
    symbols = []
    for _ in range(num_symbols):
        s = r.read(max_bits)
        if s >= alphabet_size:
            raise BitstreamError("simple prefix symbol out of range")
        symbols.append(s)
    if len(set(symbols)) != num_symbols:
        raise BitstreamError("duplicate symbols in simple prefix code")
    tree_select = False
    if num_symbols == 4:
        tree_select = r.read(1) == 1

    lengths = [0] * alphabet_size
    if num_symbols == 1:
        return PrefixCode(lengths, {}, degenerate_symbol=symbols[0])
    if num_symbols == 2:
        for s in symbols:
            lengths[s] = 1
    elif num_symbols == 3:
        lengths[symbols[0]] = 1
        lengths[symbols[1]] = 2
        lengths[symbols[2]] = 2
    elif not tree_select:
        for s in symbols:
            lengths[s] = 2
    else:
        lengths[symbols[0]] = 1
        lengths[symbols[1]] = 2
        lengths[symbols[2]] = 3
        lengths[symbols[3]] = 3
    return _build_from_lengths(lengths)


def decode_prefix_code(alphabet_size: int, r: BitReader) -> PrefixCode:
    """dec_huffman.cc ReadFromBitStream."""
    if alphabet_size > (1 << PREFIX_MAX_BITS):
        raise BitstreamError("prefix alphabet too large")
    simple_code_or_skip = r.read(2)
    if simple_code_or_skip == 1:
        return _read_simple_code(alphabet_size, r)

    # Read the code-length-code lengths.
    clcl = [0] * _CODE_LENGTH_CODES
    space = 32
    num_codes = 0
    i = simple_code_or_skip
    while i < _CODE_LENGTH_CODES and space > 0:
        v = _clcl_read(r)
        clcl[_CODE_LENGTH_CODE_ORDER[i]] = v
        if v != 0:
            space -= 32 >> v
            num_codes += 1
        i += 1
    if not (num_codes == 1 or space == 0):
        raise BitstreamError("invalid code length code")

    # Decode code lengths using the code-length code.
    if num_codes == 1:
        # Degenerate meta-code: the single used symbol repeats with zero
        # bits consumed (reference builds a 0-bit table).
        the_code = next(s for s, l in enumerate(clcl) if l)
        meta = PrefixCode(clcl, {}, degenerate_symbol=the_code)
    else:
        meta = _build_from_lengths(clcl)

    code_lengths = [0] * alphabet_size
    symbol = 0
    prev_code_len = _DEFAULT_CODE_LENGTH
    repeat = 0
    repeat_code_len = 0
    space = 32768
    while symbol < alphabet_size and space > 0:
        code_len = meta.read_symbol(r)
        if code_len < _REPEAT_PREVIOUS:
            repeat = 0
            code_lengths[symbol] = code_len
            symbol += 1
            if code_len != 0:
                prev_code_len = code_len
                space -= 32768 >> code_len
        else:
            extra_bits = code_len - 14
            new_len = prev_code_len if code_len == _REPEAT_PREVIOUS else 0
            if repeat_code_len != new_len:
                repeat = 0
                repeat_code_len = new_len
            old_repeat = repeat
            if repeat > 0:
                repeat = (repeat - 2) << extra_bits
            repeat += r.read(extra_bits) + 3
            repeat_delta = repeat - old_repeat
            if symbol + repeat_delta > alphabet_size:
                raise BitstreamError("prefix repeat overflows alphabet")
            for _ in range(repeat_delta):
                code_lengths[symbol] = repeat_code_len
                symbol += 1
            if repeat_code_len != 0:
                space -= repeat_delta << (15 - repeat_code_len)
    if space != 0:
        raise BitstreamError("prefix code lengths not complete")
    return _build_from_lengths(code_lengths)


# ---------------------------------------------------------------------------
# Encoder


def _create_huffman_lengths(counts: np.ndarray, limit: int) -> list[int]:
    """Depth-limited Huffman lengths (enc_huffman_tree.cc CreateHuffmanTree
    retry strategy: clamp small counts upward until the limit holds)."""
    n = len(counts)
    nonzero = [i for i in range(n) if counts[i] > 0]
    if len(nonzero) <= 1:
        lengths = [0] * n
        for i in nonzero:
            lengths[i] = 1
        return lengths
    count_limit = 1
    while True:
        # Build Huffman tree with counts clamped to >= count_limit.
        heap = [(max(int(counts[i]), count_limit), i, None) for i in nonzero]
        heapq.heapify(heap)
        nodes = {}
        next_id = n
        while len(heap) > 1:
            c1, i1, _ = heapq.heappop(heap)
            c2, i2, _ = heapq.heappop(heap)
            nodes[next_id] = (i1, i2)
            heapq.heappush(heap, (c1 + c2, next_id, None))
            next_id += 1
        root = heap[0][1]
        lengths = [0] * n
        stack = [(root, 0)]
        max_depth = 0
        while stack:
            node, d = stack.pop()
            if node in nodes:
                a, b = nodes[node]
                stack.append((a, d + 1))
                stack.append((b, d + 1))
            else:
                lengths[node] = max(d, 1)
                max_depth = max(max_depth, d)
        if max_depth <= limit:
            return lengths
        count_limit *= 2


def _reverse_bits(value: int, nbits: int) -> int:
    r = 0
    for _ in range(nbits):
        r = (r << 1) | (value & 1)
        value >>= 1
    return r


def _canonical_bits(code_lengths: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Per-symbol (depth, reversed canonical code) ready for an LSB-first
    writer (enc_huffman_tree ConvertBitDepthsToSymbols)."""
    n = len(code_lengths)
    depths = np.array(code_lengths, np.uint8)
    bits = np.zeros(n, np.uint16)
    order = sorted((length, sym) for sym, length in enumerate(code_lengths)
                   if length > 0)
    code = 0
    prev_len = order[0][0] if order else 0
    for length, sym in order:
        code <<= (length - prev_len)
        bits[sym] = _reverse_bits(code, length)
        code += 1
        prev_len = length
    return depths, bits


def _write_code_lengths(code_lengths: list[int], w: BitWriter) -> None:
    """StoreHuffmanTree: RLE-compress lengths, then meta-code them."""
    # Trim trailing zeros (decoder zero-fills the tail).
    trimmed = list(code_lengths)
    while trimmed and trimmed[-1] == 0:
        trimmed.pop()

    # RLE into (meta_symbol, extra_bits_value) pairs. No chained repeats:
    # a literal separates consecutive repeat codes, resetting the
    # decoder's accumulator (dec_huffman.cc:57-62).
    seq: list[tuple[int, int]] = []
    i = 0
    prev_nonzero = _DEFAULT_CODE_LENGTH
    while i < len(trimmed):
        v = trimmed[i]
        run = 1
        while i + run < len(trimmed) and trimmed[i + run] == v:
            run += 1
        if v == 0:
            remaining = run
            while remaining >= 3:
                t = min(remaining, 10)
                seq.append((_REPEAT_ZERO, t - 3))
                remaining -= t
                if remaining >= 3:
                    # Reset accumulator with a literal zero.
                    seq.append((0, -1))
                    remaining -= 1
            for _ in range(remaining):
                seq.append((0, -1))
        else:
            # First occurrence is always a literal (sets prev_code_len).
            seq.append((v, -1))
            prev_nonzero = v
            remaining = run - 1
            while remaining >= 3:
                t = min(remaining, 6)
                seq.append((_REPEAT_PREVIOUS, t - 3))
                remaining -= t
                if remaining >= 3:
                    seq.append((v, -1))
                    remaining -= 1
            for _ in range(remaining):
                seq.append((v, -1))
        i += run

    # Meta-code over the 18 possible symbols.
    hist = np.zeros(_CODE_LENGTH_CODES, np.int64)
    for s, _ in seq:
        hist[s] += 1
    meta_lengths = _create_huffman_lengths(hist, 5)
    num_used = int(np.count_nonzero(hist))
    if num_used == 1:
        # Single meta symbol: decoder accepts num_codes==1 with a 0-bit
        # table; write its length then emit no per-symbol bits.
        pass
    meta_depths, meta_bits = _canonical_bits(meta_lengths)

    # StoreHuffmanTreeOfHuffmanTreeToBitMask
    codes_to_store = _CODE_LENGTH_CODES
    if num_used > 1:
        while codes_to_store > 0 and \
                meta_lengths[_CODE_LENGTH_CODE_ORDER[codes_to_store - 1]] == 0:
            codes_to_store -= 1
    skip_some = 0
    if meta_lengths[_CODE_LENGTH_CODE_ORDER[0]] == 0 and \
            meta_lengths[_CODE_LENGTH_CODE_ORDER[1]] == 0:
        skip_some = 3 if meta_lengths[_CODE_LENGTH_CODE_ORDER[2]] == 0 else 2
    w.write(2, skip_some)
    for idx in range(skip_some, codes_to_store):
        length = meta_lengths[_CODE_LENGTH_CODE_ORDER[idx]]
        sym_bits, sym_len = _CLCL_CODE[length]
        w.write(sym_len, sym_bits)

    # StoreHuffmanTreeToBitMask
    for s, extra in seq:
        if num_used > 1:
            w.write(int(meta_depths[s]), int(meta_bits[s]))
        if s == _REPEAT_PREVIOUS:
            w.write(2, extra)
        elif s == _REPEAT_ZERO:
            w.write(3, extra)


def build_and_store_prefix_code(counts: np.ndarray, w: BitWriter) -> PrefixCode:
    """BuildAndStoreHuffmanTree (enc_huffman.cc:186-236)."""
    length = len(counts)
    nonzero = [i for i in range(length) if counts[i] > 0]
    max_bits = (length - 1).bit_length()

    if len(nonzero) <= 1:
        w.write(2, 1)  # simple
        w.write(2, 0)  # nsym - 1 = 0
        sym = nonzero[0] if nonzero else 0
        w.write(max_bits, sym)
        lengths = [0] * length
        pc = PrefixCode(lengths, {}, degenerate_symbol=sym)
        pc.depths = np.zeros(length, np.uint8)
        pc.bits = np.zeros(length, np.uint16)
        return pc

    lengths = _create_huffman_lengths(np.asarray(counts), PREFIX_MAX_BITS)
    depths, bits = _canonical_bits(lengths)

    if len(nonzero) <= 4:
        # StoreSimpleHuffmanTree
        syms = sorted(nonzero, key=lambda s: (lengths[s], s))
        w.write(2, 1)
        w.write(2, len(syms) - 1)
        for s in syms:
            w.write(max_bits, s)
        if len(syms) == 4:
            w.write(1, 1 if lengths[syms[0]] == 1 else 0)
    else:
        _write_code_lengths(lengths, w)

    pc = _build_from_lengths(lengths)
    pc.depths = depths
    pc.bits = bits
    return pc
