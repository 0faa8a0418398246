"""Field coders + Bundle visitor serialization.

Reference: lib/jxl/fields.{h,cc}, field_encodings.h.

* U32: 2-bit selector chooses one of four distributions; each is either
  a direct value or `offset + n extra bits` (fields.h:41-57).
* U64: 2-bit selector: 0; 1+4bits; 17+8bits; or a 12-then-8-bit varint
  with 4 final bits at shift 60 (fields.cc:494-520).
* F16: IEEE binary16, NaN/Inf rejected (fields.h:88).
* Bundle: every header struct implements `visit_fields(v)` once; Read /
  Write / Init / AllDefault / CanEncode visitors share that definition
  (fields.h:100-150). Python visitors return the new value instead of
  writing through pointers.
"""

from __future__ import annotations

import dataclasses
import struct

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter


# ---------------------------------------------------------------------------
# U32 distributions


@dataclasses.dataclass(frozen=True)
class U32Distr:
    """One of the four branches of a U32 encoding."""
    offset: int
    nbits: int  # 0 with direct=True means a literal value

    @property
    def is_direct(self) -> bool:
        return self.nbits == 0


def Val(v: int) -> U32Distr:
    return U32Distr(v, 0)


def BitsOffset(nbits: int, offset: int) -> U32Distr:
    assert nbits > 0
    return U32Distr(offset, nbits)


def Bits(nbits: int) -> U32Distr:
    return BitsOffset(nbits, 0)


class U32Enc:
    __slots__ = ("d",)

    def __init__(self, d0: U32Distr, d1: U32Distr, d2: U32Distr, d3: U32Distr):
        self.d = (d0, d1, d2, d3)


def read_u32(enc: U32Enc, r: BitReader) -> int:
    d = enc.d[r.read(2)]
    if d.is_direct:
        return d.offset
    return d.offset + r.read(d.nbits)


def _u32_selector(enc: U32Enc, value: int) -> tuple[int, int]:
    """Smallest-bit-count selector for value; (selector, total_bits)."""
    best = None
    for sel, d in enumerate(enc.d):
        if d.is_direct:
            if value == d.offset:
                return sel, 2  # direct match is always cheapest
        else:
            if d.offset <= value < d.offset + (1 << d.nbits):
                bits = 2 + d.nbits
                if best is None or bits < best[1]:
                    best = (sel, bits)
    if best is None:
        raise BitstreamError(f"U32 value {value} not encodable")
    return best


def write_u32(enc: U32Enc, value: int, w: BitWriter) -> None:
    sel, _ = _u32_selector(enc, value)
    w.write(2, sel)
    d = enc.d[sel]
    if not d.is_direct:
        w.write(d.nbits, value - d.offset)


def u32_bit_count(enc: U32Enc, value: int) -> int:
    return _u32_selector(enc, value)[1]


# ---------------------------------------------------------------------------
# U64


def read_u64(r: BitReader) -> int:
    selector = r.read(2)
    if selector == 0:
        return 0
    if selector == 1:
        return 1 + r.read(4)
    if selector == 2:
        return 17 + r.read(8)
    result = r.read(12)
    shift = 12
    while r.read(1):
        if shift == 60:
            result |= r.read(4) << shift
            break
        result |= r.read(8) << shift
        shift += 8
    return result


def write_u64(value: int, w: BitWriter) -> None:
    if value == 0:
        w.write(2, 0)
    elif value <= 16:
        w.write(2, 1)
        w.write(4, value - 1)
    elif value <= 272:
        w.write(2, 2)
        w.write(8, value - 17)
    else:
        w.write(2, 3)
        w.write(12, value & 0xFFF)
        value >>= 12
        shift = 12
        while value > 0:
            w.write(1, 1)
            if shift == 60:
                w.write(4, value & 0xF)
                value = 0
                break
            w.write(8, value & 0xFF)
            value >>= 8
            shift += 8
        else:
            w.write(1, 0)
            return
        # wrote final 4-bit group; no stop bit after shift 60
        return


# ---------------------------------------------------------------------------
# F16


def read_f16(r: BitReader) -> float:
    bits16 = r.read(16)
    # Reject NaN/Inf (exponent all-ones), reference fields.cc F16Coder::Read.
    if (bits16 & 0x7C00) == 0x7C00:
        raise BitstreamError("F16 NaN/Inf not allowed")
    return float(struct.unpack("<e", struct.pack("<H", bits16))[0])


def write_f16(value: float, w: BitWriter) -> None:
    try:
        bits16 = struct.unpack("<H", struct.pack("<e", value))[0]
    except (OverflowError, struct.error) as e:
        raise BitstreamError(f"F16 cannot encode {value}") from e
    w.write(16, bits16)


# ---------------------------------------------------------------------------
# Bundle visitors

# Enum encoding shared by all Enum fields (fields.h:205-216).
_ENUM_ENC = None  # initialized below


class Visitor:
    """Base visitor. Methods take (default, value) and return the new value.

    `value` is ignored by ReadVisitor/InitVisitor; `default` is ignored
    by Write. Headers implement visit_fields(v) using only these calls so
    read/write/size share one field list (reference Bundle pattern).
    """

    reading = False

    def bits(self, n: int, default: int, value: int) -> int:
        raise NotImplementedError

    def u32(self, enc: U32Enc, default: int, value: int) -> int:
        raise NotImplementedError

    def u64(self, default: int, value: int) -> int:
        raise NotImplementedError

    def f16(self, default: float, value: float) -> float:
        raise NotImplementedError

    def bool_(self, default: bool, value: bool) -> bool:
        return self.bits(1, int(default), int(bool(value))) == 1

    def enum(self, default: int, value: int) -> int:
        v = self.u32(_ENUM_ENC, int(default), int(value))
        if v > 81:
            raise BitstreamError(f"enum value {v} out of range")
        return v

    def conditional(self, condition: bool) -> bool:
        """Whether dependent fields should be visited now."""
        return condition

    def all_default(self, fields) -> bool:
        """Handle the leading all_default bit. True => stop visiting.

        Caller pattern:
            if v.all_default(self): return
        """
        raise NotImplementedError

    def visit_nested(self, fields) -> None:
        fields.visit_fields(self)

    def begin_extensions(self, extensions: int) -> int:
        return self.u64(0, extensions)

    def end_extensions(self) -> None:
        pass


class InitVisitor(Visitor):
    def bits(self, n, default, value):
        return default

    def u32(self, enc, default, value):
        return default

    def u64(self, default, value):
        return default

    def f16(self, default, value):
        return default

    def conditional(self, condition):
        return True  # initialize every field

    def all_default(self, fields):
        fields.all_default = True
        return False  # keep initializing the rest

    def visit_nested(self, fields):
        fields.visit_fields(self)


class AllDefaultVisitor(Visitor):
    def __init__(self):
        self.ok = True

    def bits(self, n, default, value):
        self.ok &= value == default
        return value

    def u32(self, enc, default, value):
        self.ok &= value == default
        return value

    def u64(self, default, value):
        self.ok &= value == default
        return value

    def f16(self, default, value):
        self.ok &= abs(value - default) < 1e-6
        return value

    def all_default(self, fields):
        return False  # visit everything to compute self.ok


def bundle_all_default(fields) -> bool:
    v = AllDefaultVisitor()
    fields.visit_fields(v)
    return v.ok


class ReadVisitor(Visitor):
    reading = True

    def __init__(self, reader: BitReader):
        self.r = reader

    def bits(self, n, default, value):
        return self.r.read(n)

    def u32(self, enc, default, value):
        return read_u32(enc, self.r)

    def u64(self, default, value):
        return read_u64(self.r)

    def f16(self, default, value):
        return read_f16(self.r)

    def all_default(self, fields):
        fields.all_default = self.r.read_bool()
        if fields.all_default:
            bundle_set_default(fields)
        return fields.all_default

    def begin_extensions(self, extensions):
        ext = read_u64(self.r)
        self._ext_bits = 0
        rem = ext
        while rem:
            rem &= rem - 1
            self._ext_bits += read_u64(self.r)
        self._pos_after_ext_size = self.r.bits_consumed
        return ext

    def end_extensions(self):
        if getattr(self, "_pos_after_ext_size", 0):
            consumed = self.r.bits_consumed - self._pos_after_ext_size
            if consumed > self._ext_bits:
                raise BitstreamError("read more extension bits than signaled")
            self.r.skip(self._ext_bits - consumed)


class WriteVisitor(Visitor):
    def __init__(self, writer: BitWriter):
        self.w = writer

    def bits(self, n, default, value):
        self.w.write(n, value)
        return value

    def u32(self, enc, default, value):
        write_u32(enc, value, self.w)
        return value

    def u64(self, default, value):
        write_u64(value, self.w)
        return value

    def f16(self, default, value):
        write_f16(value, self.w)
        return value

    def all_default(self, fields):
        fields.all_default = bundle_all_default(fields)
        self.w.write(1, int(fields.all_default))
        return fields.all_default

    def begin_extensions(self, extensions):
        if extensions != 0:
            raise BitstreamError("writing extensions is not supported")
        write_u64(0, self.w)
        return 0


class SizeVisitor(Visitor):
    """Counts encoded bits without writing (reference CanEncodeVisitor)."""

    def __init__(self):
        self.bits_total = 0

    def bits(self, n, default, value):
        self.bits_total += n
        return value

    def u32(self, enc, default, value):
        self.bits_total += u32_bit_count(enc, value)
        return value

    def u64(self, default, value):
        w = BitWriter()
        write_u64(value, w)
        self.bits_total += w.bits_written
        return value

    def f16(self, default, value):
        self.bits_total += 16
        return value

    def all_default(self, fields):
        fields.all_default = bundle_all_default(fields)
        self.bits_total += 1
        return fields.all_default

    def begin_extensions(self, extensions):
        self.bits_total += 2  # u64(0)
        return 0


_ENUM_ENC = U32Enc(Val(0), Val(1), BitsOffset(4, 2), BitsOffset(6, 18))


def bundle_read(reader: BitReader, fields) -> None:
    fields.visit_fields(ReadVisitor(reader))
    if not reader.all_reads_within_bounds():
        from libjxl_tpu.base.errors import NotEnoughBytesError
        raise NotEnoughBytesError("not enough bytes for header")


def bundle_write(fields, writer: BitWriter) -> None:
    fields.visit_fields(WriteVisitor(writer))


def bundle_set_default(fields) -> None:
    fields.visit_fields(InitVisitor())


def bundle_bit_size(fields) -> int:
    v = SizeVisitor()
    fields.visit_fields(v)
    return v.bits_total
