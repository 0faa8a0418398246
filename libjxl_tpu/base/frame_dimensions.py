"""Block / group / DC-group tiling math.

Reference: lib/jxl/frame_dimensions.h:21-113. The tiling hierarchy
(8x8 blocks -> 256x256 groups -> 2048x2048 DC groups) is the unit of
section-parallelism in the bitstream, and on TPU the `group` axis is the
batch axis for all device compute.
"""

from __future__ import annotations

import dataclasses

from libjxl_tpu.base.rect import Rect, div_ceil

BLOCK_DIM = 8
DCT_BLOCK_SIZE = BLOCK_DIM * BLOCK_DIM
GROUP_DIM = 256


@dataclasses.dataclass
class FrameDimensions:
    xsize: int = 0
    ysize: int = 0
    xsize_upsampled: int = 0
    ysize_upsampled: int = 0
    xsize_upsampled_padded: int = 0
    ysize_upsampled_padded: int = 0
    xsize_padded: int = 0
    ysize_padded: int = 0
    xsize_blocks: int = 0
    ysize_blocks: int = 0
    xsize_groups: int = 0
    ysize_groups: int = 0
    xsize_dc_groups: int = 0
    ysize_dc_groups: int = 0
    num_groups: int = 0
    num_dc_groups: int = 0
    group_dim: int = GROUP_DIM
    dc_group_dim: int = GROUP_DIM * BLOCK_DIM

    @staticmethod
    def make(xsize_px: int, ysize_px: int, *, group_size_shift: int = 1,
             max_hshift: int = 0, max_vshift: int = 0,
             modular_mode: bool = False, upsampling: int = 1,
             ) -> "FrameDimensions":
        # group_size_shift=1 gives the default 256 (reference frame_header
        # signals 128<<shift with shift in 0..3).
        fd = FrameDimensions()
        fd.group_dim = (GROUP_DIM >> 1) << group_size_shift
        fd.dc_group_dim = fd.group_dim * BLOCK_DIM
        fd.xsize_upsampled = xsize_px
        fd.ysize_upsampled = ysize_px
        fd.xsize = div_ceil(xsize_px, upsampling)
        fd.ysize = div_ceil(ysize_px, upsampling)
        fd.xsize_blocks = div_ceil(fd.xsize, BLOCK_DIM << max_hshift) << max_hshift
        fd.ysize_blocks = div_ceil(fd.ysize, BLOCK_DIM << max_vshift) << max_vshift
        fd.xsize_padded = fd.xsize_blocks * BLOCK_DIM
        fd.ysize_padded = fd.ysize_blocks * BLOCK_DIM
        if modular_mode:
            fd.xsize_padded = fd.xsize
            fd.ysize_padded = fd.ysize
        fd.xsize_upsampled_padded = fd.xsize_padded * upsampling
        fd.ysize_upsampled_padded = fd.ysize_padded * upsampling
        fd.xsize_groups = div_ceil(fd.xsize, fd.group_dim)
        fd.ysize_groups = div_ceil(fd.ysize, fd.group_dim)
        fd.xsize_dc_groups = div_ceil(fd.xsize_blocks, fd.group_dim)
        fd.ysize_dc_groups = div_ceil(fd.ysize_blocks, fd.group_dim)
        fd.num_groups = fd.xsize_groups * fd.ysize_groups
        fd.num_dc_groups = fd.xsize_dc_groups * fd.ysize_dc_groups
        return fd

    def group_rect(self, group_index: int) -> Rect:
        gx = group_index % self.xsize_groups
        gy = group_index // self.xsize_groups
        return Rect.clamped(gx * self.group_dim, gy * self.group_dim,
                            self.group_dim, self.group_dim,
                            self.xsize, self.ysize)

    def block_group_rect(self, group_index: int) -> Rect:
        """AC-group rect in units of 8x8 blocks."""
        gx = group_index % self.xsize_groups
        gy = group_index // self.xsize_groups
        gb = self.group_dim // BLOCK_DIM
        return Rect.clamped(gx * gb, gy * gb, gb, gb,
                            self.xsize_blocks, self.ysize_blocks)

    def dc_group_rect(self, group_index: int) -> Rect:
        """DC-group rect in units of 8x8 blocks (one px per block)."""
        gx = group_index % self.xsize_dc_groups
        gy = group_index // self.xsize_dc_groups
        return Rect.clamped(gx * self.group_dim, gy * self.group_dim,
                            self.group_dim, self.group_dim,
                            self.xsize_blocks, self.ysize_blocks)
