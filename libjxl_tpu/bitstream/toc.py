"""Frame table of contents: per-section sizes + optional permutation.

Reference: lib/jxl/toc.{h,cc}, enc_toc.cc, coeff_order.cc
(DecodePermutation/EncodePermutation — permutations are Lehmer-coded
token streams with 8 contexts). Sections are byte-aligned and
independent — this is what makes decode group-parallel.
"""

from __future__ import annotations

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import Bits, BitsOffset, U32Enc, read_u32, write_u32
from libjxl_tpu.bitstream.lehmer import compute_lehmer_code, decode_lehmer_code

TOC_DIST = U32Enc(Bits(10), BitsOffset(14, 1024), BitsOffset(22, 17408),
                  BitsOffset(30, 4211712))

PERMUTATION_CONTEXTS = 8


def ac_group_index(pass_idx: int, group: int, num_groups: int,
                   num_dc_groups: int) -> int:
    """toc.h:31."""
    return 2 + num_dc_groups + pass_idx * num_groups + group


def num_toc_entries(num_groups: int, num_dc_groups: int,
                    num_passes: int) -> int:
    """toc.h:36."""
    if num_groups == 1 and num_passes == 1:
        return 1
    return ac_group_index(0, 0, num_groups, num_dc_groups) \
        + num_groups * num_passes


def _coeff_order_context(val: int) -> int:
    """coeff_order.cc:30-34: token of HybridUintConfig(0,0,0), capped."""
    # split_exponent 0: token = n+1 encoding; token for val<1 is val,
    # else 1 + floor_log2(val)... config(0,0,0): split_token=1.
    if val < 1:
        return 0
    token = 1 + (val.bit_length() - 1)
    return min(token, PERMUTATION_CONTEXTS - 1)


def read_permutation(skip: int, size: int, r: BitReader,
                     reader=None) -> list[int]:
    """coeff_order.cc:37-80. If reader is None, decodes its own
    histograms (DecodePermutation); else uses the shared SymbolReader."""
    from libjxl_tpu.entropy.codes import decode_histograms, SymbolReader

    own_reader = reader is None
    if own_reader:
        codes = decode_histograms(r, PERMUTATION_CONTEXTS)
        reader = SymbolReader(codes, r)
    end = reader.read(_coeff_order_context(size)) + skip
    if end > size:
        raise BitstreamError("invalid permutation size")
    lehmer = [0] * size
    last = 0
    for i in range(skip, end):
        lehmer[i] = reader.read(_coeff_order_context(last))
        last = lehmer[i]
        if lehmer[i] >= size - i:
            raise BitstreamError("invalid lehmer code value")
    if own_reader and not reader.check_final_state():
        raise BitstreamError("invalid ANS state after permutation")
    return decode_lehmer_code(lehmer)


def write_permutation(permutation: list[int], skip: int, w: BitWriter,
                      tokens_out=None) -> None:
    """EncodePermutation (enc_coeff_order.cc): Lehmer-code then token."""
    from libjxl_tpu.entropy.codes import (
        Token, build_and_encode_histograms, write_tokens)

    size = len(permutation)
    lehmer = compute_lehmer_code(permutation)
    end = len(lehmer)
    while end > skip and lehmer[end - 1] == 0:
        end -= 1
    tokens = [Token(_coeff_order_context(size), end - skip)]
    last = 0
    for i in range(skip, end):
        tokens.append(Token(_coeff_order_context(last), lehmer[i]))
        last = lehmer[i]
    if tokens_out is not None:
        tokens_out.extend(tokens)
        return
    codes = build_and_encode_histograms(PERMUTATION_CONTEXTS, [tokens], w)
    write_tokens(tokens, codes, w)


def read_toc(toc_entries: int, r: BitReader) -> tuple[list[int], list[int]]:
    """toc.cc:29-74 ReadToc+ReadGroupOffsets. Returns (sizes, offsets)
    already permuted into stream order."""
    if toc_entries > 65536:
        raise BitstreamError("too many TOC entries")
    permutation = None
    if r.read(1) == 1:
        permutation = read_permutation(0, toc_entries, r)
    r.align_to_byte()
    sizes = [read_u32(TOC_DIST, r) for _ in range(toc_entries)]
    r.align_to_byte()
    offsets = []
    offset = 0
    for s in sizes:
        offsets.append(offset)
        offset += s
    if permutation is not None:
        sizes = [sizes[i] for i in permutation]
        offsets = [offsets[i] for i in permutation]
    return sizes, offsets


def write_toc(sizes: list[int], w: BitWriter,
              permutation: list[int] | None = None) -> None:
    """enc_toc.cc WriteGroupOffsets."""
    if permutation is not None:
        w.write(1, 1)
        write_permutation(permutation, 0, w)
    else:
        w.write(1, 0)
    w.align_to_byte()
    for s in sizes:
        write_u32(TOC_DIST, s, w)
    w.align_to_byte()
