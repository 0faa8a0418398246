"""Bitstream primitives (host side).

Reference layer L2: lib/jxl/dec_bit_reader.h, enc_bit_writer.h,
fields.{h,cc}, toc.cc, lehmer_code.h. All byte-oriented sequential
parsing lives here; nothing in this package touches JAX.
"""

from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import (
    Bits,
    BitsOffset,
    U32Enc,
    Val,
    read_u32,
    write_u32,
    read_u64,
    write_u64,
)

__all__ = [
    "BitReader",
    "BitWriter",
    "Val",
    "Bits",
    "BitsOffset",
    "U32Enc",
    "read_u32",
    "write_u32",
    "read_u64",
    "write_u64",
]
