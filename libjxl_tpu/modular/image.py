"""Modular image: variable-size int32 channel stack.

Reference: lib/jxl/modular/modular_image.h — Channel (w, h, hshift,
vshift) and Image (channels + nb_meta_channels + transform list).
Channels are numpy int32 arrays of shape (h, w).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Channel:
    data: np.ndarray  # int32 (h, w)
    hshift: int = 0
    vshift: int = 0
    # Originating color/extra component (modular_image.h:39); squeeze
    # residual channels inherit it for the lossy quantization tables.
    component: int = -1

    @property
    def w(self) -> int:
        return self.data.shape[1]

    @property
    def h(self) -> int:
        return self.data.shape[0]

    @staticmethod
    def create(w: int, h: int, hshift: int = 0, vshift: int = 0) -> "Channel":
        return Channel(np.zeros((h, w), np.int32), hshift, vshift)


class ModularImage:
    """Reference: modular_image.h:86 Image."""

    def __init__(self, w: int, h: int, bitdepth: int, nb_chans: int):
        self.w = w
        self.h = h
        self.bitdepth = bitdepth
        self.nb_meta_channels = 0
        self.channel: list[Channel] = [
            Channel.create(w, h) for _ in range(nb_chans)]

    @staticmethod
    def from_planes(planes: list[np.ndarray], bitdepth: int) -> "ModularImage":
        h, w = planes[0].shape
        img = ModularImage(w, h, bitdepth, 0)
        img.channel = [Channel(np.asarray(p, np.int32).copy(),
                               component=i)
                       for i, p in enumerate(planes)]
        return img

    def clone(self) -> "ModularImage":
        img = ModularImage(self.w, self.h, self.bitdepth, 0)
        img.nb_meta_channels = self.nb_meta_channels
        img.channel = [Channel(c.data.copy(), c.hshift, c.vshift,
                               c.component)
                       for c in self.channel]
        return img
