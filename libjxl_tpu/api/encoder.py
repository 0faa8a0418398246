"""Queue-based encoder API.

Reference: lib/jxl/encode.cc (JxlEncoder: frame settings, AddImageFrame /
AddBox queue, ProcessOutput). Frames and metadata boxes are queued, then
the whole container/codestream is produced by process_output().
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class FrameSettings:
    """JxlEncoderFrameSettings analogue (the useful subset)."""
    distance: float = 1.0
    lossless: bool = False
    effort: int = 7
    progressive: bool = False
    resampling: int = 1
    noise: float | None = None
    duration: int = 0


class Encoder:
    """JxlEncoder analogue. Usage:

        enc = Encoder(use_container=True)
        enc.add_image_frame(img, FrameSettings(distance=1.0))
        data = enc.process_output()
    """

    def __init__(self, *, use_container: bool = False,
                 animation_tps: tuple | None = None, num_loops: int = 0):
        self._frames: list = []
        self._boxes: list = []
        self.use_container = use_container
        self.animation_tps = animation_tps
        self.num_loops = num_loops
        self._output: bytes | None = None

    def add_image_frame(self, image: np.ndarray,
                        settings: FrameSettings | None = None) -> None:
        if self._output is not None:
            raise RuntimeError("encoder output already produced")
        self._frames.append((image, settings or FrameSettings()))

    def add_box(self, box_type: bytes, contents: bytes) -> None:
        if box_type not in (b"Exif", b"xml ", b"jumb"):
            raise ValueError(f"unsupported box type {box_type!r}")
        self._boxes.append((box_type, contents))
        self.use_container = True

    def process_output(self) -> bytes:
        from libjxl_tpu.api.simple import encode, encode_animation
        from libjxl_tpu.container.boxes import pack_container

        if self._output is not None:
            return self._output
        if not self._frames:
            raise RuntimeError("no frames queued")
        if len(self._frames) == 1 and self.animation_tps is None:
            img, s = self._frames[0]
            codestream = encode(img, distance=s.distance,
                                lossless=s.lossless,
                                progressive=s.progressive,
                                noise=s.noise, resampling=s.resampling,
                                effort=s.effort)
        else:
            imgs = [f[0] for f in self._frames]
            settings = self._frames[0][1]
            durations = [f[1].duration or 1 for f in self._frames]
            codestream = encode_animation(
                imgs, durations=durations,
                tps=self.animation_tps or (10, 1),
                distance=settings.distance, lossless=settings.lossless,
                num_loops=self.num_loops)
        if self.use_container or self._boxes:
            exif = None
            xml = []
            for (btype, contents) in self._boxes:
                if btype == b"Exif":
                    exif = contents
                elif btype == b"xml ":
                    xml.append(contents)
            self._output = pack_container(codestream, exif=exif, xml=xml)
        else:
            self._output = codestream
        return self._output
