"""Event-driven streaming decoder API.

Reference: lib/jxl/decode.cc (JxlDecoder: Subscribe/SetInput/
ProcessInput event loop with BASIC_INFO, COLOR_ENCODING, FRAME,
FULL_IMAGE, SUCCESS, NEED_MORE_INPUT). Input may arrive in chunks; the
decoder re-attempts the next stage whenever more bytes arrive.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from libjxl_tpu.base.errors import JxlError
from libjxl_tpu.bitstream.bit_io import BitReader


class Event(enum.IntEnum):
    NEED_MORE_INPUT = 0
    BASIC_INFO = 1
    COLOR_ENCODING = 2
    FRAME = 3
    FULL_IMAGE = 4
    SUCCESS = 5
    ERROR = 6


@dataclasses.dataclass
class BasicInfo:
    xsize: int
    ysize: int
    bits_per_sample: int
    uses_original_profile: bool
    have_animation: bool
    num_extra_channels: int
    alpha_bits: int
    orientation: int


class Decoder:
    """JxlDecoder analogue. Usage:

        dec = Decoder(events={Event.BASIC_INFO, Event.FULL_IMAGE})
        dec.set_input(chunk); status = dec.process_input()
    """

    def __init__(self, events=None):
        self._events = set(events) if events else {
            Event.BASIC_INFO, Event.COLOR_ENCODING, Event.FRAME,
            Event.FULL_IMAGE}
        self._data = b""
        self._input_closed = False
        self._stage = 0          # 0=headers,1=frames,2=done
        self._emitted: set = set()
        self.basic_info: BasicInfo | None = None
        self.color_encoding = None
        self.metadata = None
        self.frame_header = None
        self.image: np.ndarray | None = None
        self.frames: list = []
        self._codestream: bytes | None = None
        self._frame_bitpos = 0
        self._refs: list = [None] * 4
        self._preview_done = False
        self._pending: list = []

    def set_input(self, data: bytes) -> None:
        self._data += data

    def close_input(self) -> None:
        self._input_closed = True

    # -- internals ------------------------------------------------------

    def _resolve_codestream(self) -> bool:
        from libjxl_tpu.container.boxes import is_container, unpack_container
        if len(self._data) < 12 and is_container(self._data):
            # Could still turn out to be a container signature.
            if self._data[:2] != b"\xff\x0a":
                return False
        if len(self._data) >= 12 and is_container(self._data):
            try:
                self._codestream = unpack_container(self._data).codestream
                return True
            except JxlError:
                if self._input_closed:
                    raise
                return False
        self._codestream = self._data
        return True

    def _try_headers(self) -> bool:
        from libjxl_tpu.frame.headers import read_codestream_headers
        try:
            r = BitReader(self._codestream)
            meta = read_codestream_headers(r)
        except JxlError:
            if self._input_closed:
                raise
            return False
        self.metadata = meta
        m = meta.m
        alpha_bits = 0
        for eci in m.extra_channel_info:
            if eci.type == 1:
                alpha_bits = eci.bit_depth.bits_per_sample
        self.basic_info = BasicInfo(
            xsize=meta.xsize, ysize=meta.ysize,
            bits_per_sample=m.bit_depth.bits_per_sample,
            uses_original_profile=not m.xyb_encoded,
            have_animation=m.have_animation,
            num_extra_channels=m.num_extra_channels,
            alpha_bits=alpha_bits, orientation=m.orientation)
        self.color_encoding = m.color_encoding
        self._frame_bitpos = r.bits_consumed
        return True

    def _try_frame(self) -> bool:
        from libjxl_tpu.frame.decode_frame import decode_frame
        from libjxl_tpu.frame.frame_header import FrameType
        try:
            r = BitReader(self._codestream)
            r.seek_bits(self._frame_bitpos)
            if self.metadata.m.have_preview and not self._preview_done:
                decode_frame(r, self.metadata, self._refs, is_preview=True)
                self._preview_done = True
                self._frame_bitpos = r.bits_consumed
            frame = decode_frame(r, self.metadata, self._refs)
        except JxlError:
            if self._input_closed:
                raise
            return False
        self._frame_bitpos = r.bits_consumed
        fh = frame.header
        if fh.frame_type == FrameType.REFERENCE_ONLY:
            if frame.xyb is not None:
                self._refs[fh.save_as_reference] = frame.xyb
            return self._try_frame()
        self.frame_header = fh
        bits = self.metadata.m.bit_depth.bits_per_sample
        dtype = np.uint8 if bits <= 8 else np.uint16
        maxval = (1 << bits) - 1
        if frame.modular_channels is not None:
            arr = np.stack(frame.modular_channels, axis=-1)
            self.image = np.clip(arr, 0, maxval).astype(dtype)
        else:
            from libjxl_tpu.color.xyb import linear_to_srgb, \
                xyb_to_linear_rgb
            srgb = linear_to_srgb(xyb_to_linear_rgb(frame.xyb))
            arr = np.clip(np.round(srgb * maxval), 0, maxval).astype(dtype)
            arr = arr.transpose(1, 2, 0)
            if frame.extra_channels:
                alpha = np.clip(frame.extra_channels[0], 0, maxval
                                ).astype(dtype)[:, :, None]
                arr = np.concatenate([arr, alpha], axis=-1)
            self.image = arr
        self.frames.append(self.image)
        self._is_last = fh.is_last
        return True

    def process_input(self) -> Event:
        """Runs until the next subscribed event (or NEED_MORE_INPUT /
        SUCCESS / ERROR)."""
        try:
            while True:
                if self._stage == 0:
                    if not self._data or not self._resolve_codestream() \
                            or not self._try_headers():
                        return Event.NEED_MORE_INPUT
                    self._stage = 1
                    for ev in (Event.BASIC_INFO, Event.COLOR_ENCODING):
                        if ev in self._events:
                            self._pending.append(ev)
                if self._pending:
                    return self._pending.pop(0)
                if self._stage == 1:
                    # Container data may have grown.
                    if not self._resolve_codestream():
                        return Event.NEED_MORE_INPUT
                    if not self._try_frame():
                        return Event.NEED_MORE_INPUT
                    if Event.FRAME in self._events:
                        self._pending.append(Event.FRAME)
                    if Event.FULL_IMAGE in self._events:
                        self._pending.append(Event.FULL_IMAGE)
                    if self._is_last:
                        self._stage = 2
                        self._pending.append(Event.SUCCESS)
                    if self._pending:
                        return self._pending.pop(0)
                if self._stage == 2:
                    return Event.SUCCESS
        except JxlError:
            return Event.ERROR
