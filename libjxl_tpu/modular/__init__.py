"""Modular mode: lossless/integer codec + VarDCT's DC & control fields.

Reference layer L4b: lib/jxl/modular/. Host-side bitstream work
(tree decode, token streams) lives here in numpy; inverse transforms
(RCT/Squeeze) also have batched JAX formulations under ops/ for the
decode hot path.
"""

from libjxl_tpu.modular.image import Channel, ModularImage
from libjxl_tpu.modular.codec import (
    GroupHeader,
    Transform,
    TransformId,
    modular_decode,
    modular_encode,
)

__all__ = [
    "Channel",
    "ModularImage",
    "GroupHeader",
    "Transform",
    "TransformId",
    "modular_decode",
    "modular_encode",
]
