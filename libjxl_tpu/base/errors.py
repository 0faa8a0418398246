"""Error types.

Reference: lib/jxl/base/status.h — `Status`/`StatusOr` with the special
non-fatal `kNotEnoughBytes` code that drives streaming resume. In Python
we use exceptions; `NotEnoughBytesError` plays the resumable role: the
decoder API catches it, asks for more input, and re-enters.
"""


class JxlError(Exception):
    """Base class for all codec errors (reference: JXL_FAILURE)."""


class BitstreamError(JxlError):
    """Invalid or corrupt bitstream."""


class NotEnoughBytesError(JxlError):
    """More input needed; the operation can resume once it arrives.

    Reference: StatusCode::kNotEnoughBytes (base/status.h) used by
    decode.cc's RequestMoreInput.
    """


class UnsupportedError(JxlError):
    """Feature is valid bitstream but not implemented."""


class InvalidArgumentError(JxlError):
    """Caller misuse of the API."""
