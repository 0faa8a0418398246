"""Coefficient order (de)serialization.

Reference: lib/jxl/coeff_order.cc (DecodeCoeffOrders),
enc_coeff_order.cc (EncodeCoeffOrders), frame_header.h:503 (kOrderEnc
used-orders bitmask). Orders are permutations layered on the natural
zig-zag, Lehmer-coded in a shared 8-context token stream.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import Bits, U32Enc, Val, read_u32, write_u32
from libjxl_tpu.bitstream.lehmer import compute_lehmer_code
from libjxl_tpu.bitstream.toc import (
    PERMUTATION_CONTEXTS, _coeff_order_context, read_permutation,
)
from libjxl_tpu.vardct import ac_strategy as acs

ORDER_ENC = U32Enc(Val(0x5F), Val(0x13), Val(0), Bits(acs.NUM_ORDERS))


def read_used_orders(r: BitReader) -> int:
    return read_u32(ORDER_ENC, r)


def write_used_orders(used_orders: int, w: BitWriter) -> None:
    write_u32(ORDER_ENC, used_orders, w)


def _strategy_for_order(ord_bucket: int) -> int:
    for s in range(acs.NUM_STRATEGIES):
        if acs.STRATEGY_ORDER[s] == ord_bucket:
            return s
    raise ValueError(ord_bucket)


def decode_coeff_orders(used_orders: int, used_acs: int,
                        r: BitReader) -> dict:
    """Returns {(order_bucket, channel): order array}. coeff_order.cc:102."""
    from libjxl_tpu.entropy.codes import decode_histograms, SymbolReader

    orders: dict = {}
    reader = None
    if used_orders != 0:
        codes = decode_histograms(r, PERMUTATION_CONTEXTS)
        reader = SymbolReader(codes, r)
    acs_mask = 0
    for s in range(acs.NUM_STRATEGIES):
        if used_acs & (1 << s):
            acs_mask |= 1 << acs.STRATEGY_ORDER[s]
    computed = 0
    for s in range(acs.NUM_STRATEGIES):
        ord_b = acs.STRATEGY_ORDER[s]
        if computed & (1 << ord_b):
            continue
        computed |= 1 << ord_b
        cx, cy = acs.covered_blocks(s)
        llf = cx * cy
        size = 64 * llf
        used = (acs_mask & (1 << ord_b)) != 0
        natural = acs.natural_coeff_order(s)
        if (used_orders & (1 << ord_b)) == 0:
            if used:
                for c in range(3):
                    orders[(ord_b, c)] = natural.copy()
        else:
            for c in range(3):
                perm = read_permutation(llf, size, r, reader)
                if used:
                    orders[(ord_b, c)] = natural[perm]
    if used_orders and not reader.check_final_state():
        from libjxl_tpu.base.errors import BitstreamError
        raise BitstreamError("bad ANS state after coeff orders")
    return orders


def encode_coeff_orders(used_orders: int, orders: dict, w: BitWriter) -> None:
    """EncodeCoeffOrders: write permutations for used order buckets.

    `orders` maps (order_bucket, channel) -> order array (or natural if
    absent). Permutation tokens share one stream."""
    from libjxl_tpu.entropy.codes import (
        Token, build_and_encode_histograms, write_tokens)

    if used_orders == 0:
        return
    tokens: list = []
    computed = 0
    for s in range(acs.NUM_STRATEGIES):
        ord_b = acs.STRATEGY_ORDER[s]
        if computed & (1 << ord_b):
            continue
        computed |= 1 << ord_b
        if (used_orders & (1 << ord_b)) == 0:
            continue
        cx, cy = acs.covered_blocks(s)
        llf = cx * cy
        size = 64 * llf
        natural = acs.natural_coeff_order(s)
        inv_natural = np.argsort(natural)
        for c in range(3):
            order = orders.get((ord_b, c))
            if order is None:
                perm = list(range(size))
            else:
                perm = list(inv_natural[np.asarray(order)])
            _tokenize_permutation(perm, llf, size, tokens)
    codes = build_and_encode_histograms(PERMUTATION_CONTEXTS, [tokens], w)
    write_tokens(tokens, codes, w)


def _tokenize_permutation(perm: list, skip: int, size: int,
                          tokens: list) -> None:
    from libjxl_tpu.entropy.codes import Token

    lehmer = compute_lehmer_code(perm)
    end = len(lehmer)
    while end > skip and lehmer[end - 1] == 0:
        end -= 1
    tokens.append(Token(_coeff_order_context(size), end - skip))
    last = 0
    for i in range(skip, end):
        tokens.append(Token(_coeff_order_context(last), lehmer[i]))
        last = lehmer[i]
