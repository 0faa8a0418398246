"""LSB-first bit reader / writer.

Reference: lib/jxl/dec_bit_reader.h:29 (64-bit buffered reader with
bounds-checked Refill and over-read tracking) and enc_bit_writer.h:86.
JPEG XL packs bits little-endian within bytes: the first bit of the
stream is bit 0 of byte 0, and multi-bit reads place earlier stream bits
in lower result bits.

The Python implementation buffers up to 64 bits in an int. Reads past
the end of the buffer return zero bits and set `overread` — mirroring
BitReader::AllReadsWithinBounds so streaming callers can detect
"not enough bytes" without exceptions in the hot path.
"""

from __future__ import annotations

from libjxl_tpu.base.errors import BitstreamError


class BitReader:
    __slots__ = ("_data", "_nbytes", "_pos", "_buf", "_bits_in_buf",
                 "_bits_consumed", "overread")

    def __init__(self, data: bytes | bytearray | memoryview):
        self._data = bytes(data)
        self._nbytes = len(self._data)
        self._pos = 0             # next byte to load into buffer
        self._buf = 0             # bit buffer, LSB = next bit
        self._bits_in_buf = 0
        self._bits_consumed = 0
        self.overread = False

    def _refill(self, need: int) -> None:
        while self._bits_in_buf < need:
            if self._pos < self._nbytes:
                self._buf |= self._data[self._pos] << self._bits_in_buf
                self._pos += 1
            else:
                # Past the end: virtual zero bytes, flag the over-read.
                self.overread = True
            self._bits_in_buf += 8

    def read(self, n: int) -> int:
        """Read n bits (0 <= n <= 57ish per call; loops for larger)."""
        if n == 0:
            return 0
        if n > 32:
            lo = self.read(32)
            return lo | (self.read(n - 32) << 32)
        self._refill(n)
        value = self._buf & ((1 << n) - 1)
        self._buf >>= n
        self._bits_in_buf -= n
        self._bits_consumed += n
        return value

    def read_bool(self) -> bool:
        return self.read(1) == 1

    def peek(self, n: int) -> int:
        self._refill(n)
        return self._buf & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        """Skip n bits (may be large, e.g. skipping sections)."""
        take = min(n, self._bits_in_buf)
        self._buf >>= take
        self._bits_in_buf -= take
        self._bits_consumed += take
        n -= take
        if n:
            whole_bytes, rem = divmod(n, 8)
            self._pos += whole_bytes
            if self._pos > self._nbytes:
                self.overread = True
                self._pos = self._nbytes
            self._bits_consumed += whole_bytes * 8
            if rem:
                self.read(rem)

    def align_to_byte(self) -> None:
        """Skip to byte boundary; padding bits must be zero per spec.

        Reference: BitReader::JumpToByteBoundary (dec_bit_reader.h).
        """
        rem = self._bits_consumed % 8
        if rem:
            pad = self.read(8 - rem)
            if pad != 0:
                raise BitstreamError("nonzero padding at byte alignment")

    @property
    def bits_consumed(self) -> int:
        return self._bits_consumed

    def seek_bits(self, bit_pos: int) -> None:
        """Reposition to an absolute bit offset (native-decoder handoff)."""
        self._pos = bit_pos // 8
        self._buf = 0
        self._bits_in_buf = 0
        self._bits_consumed = bit_pos
        rem = bit_pos % 8
        if rem:
            if self._pos < self._nbytes:
                self._buf = self._data[self._pos] >> rem
                self._pos += 1
                self._bits_in_buf = 8 - rem
            else:
                self.overread = True

    @property
    def raw_data(self) -> bytes:
        return self._data

    @property
    def total_bytes(self) -> int:
        return self._nbytes

    def all_reads_within_bounds(self) -> bool:
        return not self.overread

    def close(self) -> None:
        """Verify no over-read happened (reference: BitReader::Close)."""
        if self.overread:
            raise BitstreamError("bit reader over-read past end of input")


class BitWriter:
    __slots__ = ("_bytes", "_bit_pos")

    def __init__(self):
        self._bytes = bytearray()
        self._bit_pos = 0  # bits used in the last byte (0..7); 0 = aligned

    def write(self, n: int, value: int) -> None:
        """Append the low n bits of value, LSB-first."""
        if value >> n:
            raise ValueError(f"value {value} does not fit in {n} bits")
        while n > 0:
            if self._bit_pos == 0:
                self._bytes.append(0)
            free = 8 - self._bit_pos
            take = min(free, n)
            chunk = value & ((1 << take) - 1)
            self._bytes[-1] |= chunk << self._bit_pos
            self._bit_pos = (self._bit_pos + take) % 8
            value >>= take
            n -= take

    def write_bool(self, b: bool) -> None:
        self.write(1, 1 if b else 0)

    def align_to_byte(self) -> None:
        """Zero-pad to byte boundary (reference: ZeroPadToByte)."""
        self._bit_pos = 0

    @property
    def bits_written(self) -> int:
        return len(self._bytes) * 8 - ((8 - self._bit_pos) % 8)

    def append_aligned(self, other: "BitWriter") -> None:
        """Concatenate a byte-aligned writer's bytes (both must be aligned)."""
        if self._bit_pos != 0 or other._bit_pos != 0:
            raise ValueError("append_aligned requires byte alignment")
        self._bytes.extend(other._bytes)

    def append_bytes(self, data: bytes) -> None:
        if self._bit_pos != 0:
            raise ValueError("append_bytes requires byte alignment")
        self._bytes.extend(data)

    def append_bits_lsb(self, data, nbits: int) -> None:
        """Append nbits of an LSB-first packed uint8 buffer, fast even
        when the writer is bit-unaligned (vectorized shift)."""
        import numpy as np

        if nbits == 0:
            return
        arr = np.frombuffer(bytes(data), np.uint8)[: (nbits + 7) // 8].copy()
        # Mask tail bits beyond nbits.
        tail = nbits % 8
        if tail:
            arr[-1] &= (1 << tail) - 1
        off = self._bit_pos
        if off == 0:
            self._bytes.extend(arr.tobytes())
            # Fix logical bit position: mark partial last byte.
            if tail:
                self._bit_pos = tail
            return
        lo = (arr.astype(np.uint16) << off)
        shifted = np.zeros(len(arr) + 1, np.uint8)
        shifted[:-1] = (lo & 0xFF).astype(np.uint8)
        shifted[1:] |= (lo >> 8).astype(np.uint8)
        self._bytes[-1] |= int(shifted[0])
        total_bits = off + nbits
        extra_bytes = (total_bits + 7) // 8 - 1  # beyond the merged byte
        self._bytes.extend(shifted[1:1 + extra_bytes].tobytes())
        self._bit_pos = total_bits % 8

    def get_bytes(self) -> bytes:
        return bytes(self._bytes)
