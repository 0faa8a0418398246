"""Lehmer (factorial basis) permutation codes.

Reference: lib/jxl/lehmer_code.h — Fenwick-tree encode and
order-statistics-tree decode, O(n log n).
"""

from __future__ import annotations

from libjxl_tpu.base.errors import BitstreamError


def compute_lehmer_code(permutation: list[int]) -> list[int]:
    n = len(permutation)
    temp = [0] * (n + 1)
    code = [0] * n
    for idx in range(n):
        s = permutation[idx]
        penalty = 0
        i = s + 1
        while i != 0:
            penalty += temp[i]
            i &= i - 1
        if s < penalty:
            raise BitstreamError("invalid permutation")
        code[idx] = s - penalty
        i = s + 1
        while i < n + 1:
            temp[i] += 1
            i += i & (-i)
    return code


def decode_lehmer_code(code: list[int]) -> list[int]:
    n = len(code)
    if n == 0:
        return []
    log2n = max((n - 1).bit_length(), 0) if n > 1 else 0
    padded_n = 1 << log2n
    temp = [(i + 1) & -(i + 1) for i in range(padded_n)]
    permutation = [0] * n
    for i in range(n):
        if code[i] + i >= n:
            raise BitstreamError("invalid lehmer code")
        rank = code[i] + 1
        # Extract rank-th unused element via implicit order-statistics tree.
        bit = padded_n
        nxt = 0
        for _ in range(log2n + 1):
            cand = nxt + bit
            bit >>= 1
            if temp[cand - 1] < rank:
                nxt = cand
                rank -= temp[cand - 1]
        permutation[i] = nxt
        # Mark as used.
        nxt += 1
        while nxt <= padded_n:
            temp[nxt - 1] -= 1
            nxt += nxt & (-nxt)
    return permutation
