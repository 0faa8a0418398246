"""Tests mirroring reference bit_reader_test.cc / fields_test.cc."""

import random

import pytest

from libjxl_tpu.base import FrameDimensions, Rect
from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream import (
    BitReader, BitWriter, Bits, BitsOffset, U32Enc, Val,
    read_u32, write_u32, read_u64, write_u64,
)
from libjxl_tpu.bitstream.fields import (
    read_f16, write_f16, u32_bit_count,
)


def test_bit_roundtrip_random():
    rng = random.Random(1234)
    ops = [(rng.randrange(1, 33), ) for _ in range(2000)]
    vals = [rng.getrandbits(n) for (n,) in ops]
    w = BitWriter()
    for (n,), v in zip(ops, vals):
        w.write(n, v)
    w.align_to_byte()
    r = BitReader(w.get_bytes())
    for (n,), v in zip(ops, vals):
        assert r.read(n) == v
    r.close()


def test_bit_order_lsb_first():
    w = BitWriter()
    w.write(1, 1)
    w.write(2, 0b10)
    w.write(5, 0b10110)
    data = w.get_bytes()
    # bit layout in byte 0 (LSB first): 1, then 0,1, then 0,1,1,0,1
    assert data[0] == (1 | (0b10 << 1) | (0b10110 << 3))
    r = BitReader(data)
    assert r.read(1) == 1
    assert r.read(2) == 0b10
    assert r.read(5) == 0b10110


def test_overread_detection():
    r = BitReader(b"\xff")
    assert r.read(8) == 0xFF
    assert r.all_reads_within_bounds()
    assert r.read(8) == 0  # virtual zeros
    assert not r.all_reads_within_bounds()
    with pytest.raises(BitstreamError):
        r.close()


def test_skip_and_align():
    w = BitWriter()
    w.write(3, 0)
    w.align_to_byte()
    w.write(8, 0xAB)
    r = BitReader(w.get_bytes())
    r.read(3)
    r.align_to_byte()
    assert r.read(8) == 0xAB

    r2 = BitReader(bytes(range(100)))
    r2.skip(16 * 8)
    assert r2.read(8) == 16


def test_u32_examples_from_reference_doc():
    # fields.h:51 — U32Enc(Val(8), Val(16), Val(32), Bits(6)), value 32 => 2 bits
    enc = U32Enc(Val(8), Val(16), Val(32), Bits(6))
    assert u32_bit_count(enc, 32) == 2
    # fields.h:52-57 prefix code
    enc2 = U32Enc(Val(0), BitsOffset(1, 1), BitsOffset(2, 3), BitsOffset(8, 8))
    for v in [0, 1, 2, 3, 6, 8, 263]:
        w = BitWriter()
        write_u32(enc2, v, w)
        w.align_to_byte()
        assert read_u32(enc2, BitReader(w.get_bytes())) == v
    with pytest.raises(BitstreamError):
        write_u32(enc2, 264, BitWriter())


def test_u64_roundtrip():
    # Boundary values from fields.h:72-75 comment + large varint groups.
    values = [0, 1, 16, 17, 272, 273, 4095, 4096, (1 << 32) - 1,
              1 << 33, (1 << 64) - 1, 0xDEADBEEFCAFEBABE]
    for v in values:
        w = BitWriter()
        write_u64(v, w)
        w.align_to_byte()
        assert read_u64(BitReader(w.get_bytes())) == v
    # Size guarantees from the header comment.
    for v, nbits in [(0, 2), (1, 6), (16, 6), (17, 10), (272, 10), (4095, 15)]:
        w = BitWriter()
        write_u64(v, w)
        assert w.bits_written == nbits


def test_f16_roundtrip():
    for v in [0.0, 1.0, -2.5, 0.125, 65504.0]:
        w = BitWriter()
        write_f16(v, w)
        w.align_to_byte()
        assert read_f16(BitReader(w.get_bytes())) == v
    # NaN bit pattern rejected
    r = BitReader(b"\x01\x7c")  # exponent all ones
    with pytest.raises(BitstreamError):
        read_f16(r)


def test_frame_dimensions_basic():
    fd = FrameDimensions.make(1920, 1080)
    assert fd.group_dim == 256
    assert (fd.xsize_blocks, fd.ysize_blocks) == (240, 135)
    assert (fd.xsize_groups, fd.ysize_groups) == (8, 5)
    assert fd.num_groups == 40
    assert fd.num_dc_groups == 1
    # ragged right-edge group
    r = fd.group_rect(7)
    assert r.xsize == 1920 - 7 * 256
    assert r.ysize == 256


def test_frame_dimensions_small_image():
    fd = FrameDimensions.make(13, 5)
    assert (fd.xsize_padded, fd.ysize_padded) == (16, 8)
    assert fd.num_groups == 1
    assert fd.group_rect(0) == Rect(0, 0, 13, 5)


def test_rect_shift():
    r = Rect(3, 5, 13, 7)
    assert r.shift_left(3) == Rect(24, 40, 104, 56)
    assert Rect(24, 40, 100, 50).ceil_shift_right(3) == Rect(3, 5, 13, 7)
