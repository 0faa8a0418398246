"""Base utilities: errors, geometry, tiling math.

Reference layer L0 (lib/jxl/base/). Status/StatusOr become idiomatic
Python exceptions; Rect becomes a lightweight dataclass used for tile
math by both host parsing and TPU batch assembly.
"""

from libjxl_tpu.base.errors import (
    JxlError,
    BitstreamError,
    NotEnoughBytesError,
    UnsupportedError,
)
from libjxl_tpu.base.rect import Rect
from libjxl_tpu.base.frame_dimensions import (
    BLOCK_DIM,
    DCT_BLOCK_SIZE,
    GROUP_DIM,
    FrameDimensions,
)

__all__ = [
    "JxlError",
    "BitstreamError",
    "NotEnoughBytesError",
    "UnsupportedError",
    "Rect",
    "BLOCK_DIM",
    "DCT_BLOCK_SIZE",
    "GROUP_DIM",
    "FrameDimensions",
]
