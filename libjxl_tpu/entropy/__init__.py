"""Entropy coding layer (host side).

Reference layer L3: lib/jxl/dec_ans.{h,cc}, enc_ans.{h,cc},
ans_common.{h,cc}, dec_context_map.cc, enc_cluster.cc, dec_huffman.cc.
Shared by VarDCT coefficients, Modular streams, ICC, TOC permutations
and context maps. Byte-oriented and sequential per section — runs on
host; sections are decoded in parallel across groups.
"""

from libjxl_tpu.entropy.ans import (
    ANS_LOG_TAB_SIZE,
    ANS_TAB_SIZE,
    HybridUintConfig,
    read_histogram,
    write_histogram,
)
from libjxl_tpu.entropy.codes import (
    Token,
    EntropyCodes,
    decode_histograms,
    build_and_encode_histograms,
    SymbolReader,
    write_tokens,
)

__all__ = [
    "ANS_LOG_TAB_SIZE",
    "ANS_TAB_SIZE",
    "HybridUintConfig",
    "read_histogram",
    "write_histogram",
    "Token",
    "EntropyCodes",
    "decode_histograms",
    "build_and_encode_histograms",
    "SymbolReader",
    "write_tokens",
]
