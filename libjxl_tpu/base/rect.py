"""Integer rectangle with clamping, used everywhere for tile math.

Reference: lib/jxl/base/rect.h — constructor clamps the rect to the
containing image size so ragged right/bottom tiles get their true size.
"""

from __future__ import annotations

import dataclasses


def div_ceil(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class Rect:
    x0: int = 0
    y0: int = 0
    xsize: int = 0
    ysize: int = 0

    @staticmethod
    def clamped(x0: int, y0: int, xsize: int, ysize: int,
                xend: int, yend: int) -> "Rect":
        """Rect of at most (xsize, ysize) clipped to the [0,xend)x[0,yend) box."""
        cx = min(xsize, max(0, xend - x0))
        cy = min(ysize, max(0, yend - y0))
        return Rect(x0, y0, cx, cy)

    @property
    def x1(self) -> int:
        return self.x0 + self.xsize

    @property
    def y1(self) -> int:
        return self.y0 + self.ysize

    def area(self) -> int:
        return self.xsize * self.ysize

    def is_empty(self) -> bool:
        return self.xsize <= 0 or self.ysize <= 0

    def shift_left(self, shiftx: int, shifty: int | None = None) -> "Rect":
        """Multiply coordinates by 2^shift (block→pixel units)."""
        if shifty is None:
            shifty = shiftx
        return Rect(self.x0 << shiftx, self.y0 << shifty,
                    self.xsize << shiftx, self.ysize << shifty)

    def ceil_shift_right(self, shiftx: int, shifty: int | None = None) -> "Rect":
        """Divide coordinates by 2^shift, rounding sizes up (pixel→block)."""
        if shifty is None:
            shifty = shiftx
        return Rect(self.x0 >> shiftx, self.y0 >> shifty,
                    div_ceil(self.xsize, 1 << shiftx),
                    div_ceil(self.ysize, 1 << shifty))

    def intersection(self, other: "Rect") -> "Rect":
        x0 = max(self.x0, other.x0)
        y0 = max(self.y0, other.y0)
        x1 = min(self.x1, other.x1)
        y1 = min(self.y1, other.y1)
        return Rect(x0, y0, max(0, x1 - x0), max(0, y1 - y0))

    def translate(self, dx: int, dy: int) -> "Rect":
        return Rect(self.x0 + dx, self.y0 + dy, self.xsize, self.ysize)

    def slices(self) -> tuple[slice, slice]:
        """(row_slice, col_slice) for numpy indexing arr[r.slices()]."""
        return slice(self.y0, self.y1), slice(self.x0, self.x1)
