"""Sustained multi-image decode pipeline: host parse overlapped with
host->device staging and device dispatch.

The host entropy decode (C++, releases the GIL) runs on the caller's
thread while a staging worker moves the previous image's feed to the
device and enqueues its pipeline dispatch — the TPU analogue of
libjxl's "BitReader is sequential per section, everything after is
parallel" split (SURVEY.md §2.11), with the host->device link double
buffered (SURVEY.md §5.8: the real new communication backend).
"""

from __future__ import annotations

import concurrent.futures as _cf
import threading

import numpy as np


def parse_to_feed(data: bytes) -> dict:
    """Host entropy decode of a (possibly containerized) codestream into
    a device feed (single VarDCT frame)."""
    from libjxl_tpu.api.simple import is_container, unpack_container
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.frame.decode_frame import decode_frame
    from libjxl_tpu.frame.headers import read_codestream_headers
    if is_container(data):
        data = unpack_container(data).codestream
    r = BitReader(data)
    meta = read_codestream_headers(r)
    return decode_frame(r, meta, device="feed").feed


class DecodePipeline:
    """Streaming decoder: feed bitstreams in, device arrays out.

    Usage:
        pipe = DecodePipeline(out="srgb8")
        futures = [pipe.submit(s) for s in streams]
        results = [f.result() for f in futures]   # device arrays
        pipe.close()

    `max_inflight` bounds device-resident outputs (HBM pressure).
    `batch` > 1 groups consecutive same-shape frames into ONE packed
    transfer + ONE vmapped dispatch (decode_frames_device_batched) —
    per-dispatch overhead on a tunneled link is tens of ms, so batching
    is the difference between dispatch-bound and compute-bound
    throughput. flush() dispatches a partial batch.
    """

    def __init__(self, out: str = "srgb8", max_inflight: int = 4,
                 batch: int = 1):
        self._out = out
        self._batch = max(1, batch)
        self._pending: list = []   # (feed, Future)
        self._stage = _cf.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="jxl-stage")
        self._slots = threading.Semaphore(max_inflight)

    def submit(self, data: bytes) -> "_cf.Future":
        """Parse on the calling thread, then stage + dispatch on the
        worker; returns a Future of the device output array."""
        feed = parse_to_feed(data)
        self._slots.acquire()
        if self._batch == 1:
            fut = self._stage.submit(self._render, feed)
            fut.add_done_callback(lambda _: self._slots.release())
            return fut
        fut = _cf.Future()
        self._pending.append((feed, fut))
        if len(self._pending) >= self._batch:
            self.flush()
        return fut

    def flush(self) -> None:
        """Dispatch any pending partial batch."""
        if not self._pending:
            return
        group, self._pending = self._pending, []
        self._stage.submit(self._render_batch, group)

    def _render(self, feed: dict):
        from libjxl_tpu.tpu.pipeline import decode_frame_device2
        h, w = feed["image_hw"]
        return decode_frame_device2(feed, h, w, as_numpy=False,
                                    out=self._out)

    def _render_batch(self, group: list) -> None:
        from libjxl_tpu.tpu.pipeline import decode_frames_device_batched
        feeds = [f for f, _ in group]
        h, w = feeds[0]["image_hw"]
        try:
            res = decode_frames_device_batched(feeds, h, w,
                                               as_numpy=False,
                                               out=self._out)
            for i, (_, fut) in enumerate(group):
                fut.set_result(res[i])
        except ValueError:
            # Mixed shapes / non-batchable feeds: per-frame fallback.
            from libjxl_tpu.tpu.pipeline import decode_frame_device2
            for f, fut in group:
                try:
                    fh_, fw_ = f["image_hw"]
                    fut.set_result(decode_frame_device2(
                        f, fh_, fw_, as_numpy=False, out=self._out))
                except Exception as e:
                    if not fut.done():
                        fut.set_exception(e)
        except Exception as e:   # propagate to every waiter
            for _, fut in group:
                if not fut.done():
                    fut.set_exception(e)
        finally:
            for _ in group:
                self._slots.release()

    def close(self) -> None:
        self.flush()
        self._stage.shutdown(wait=True)


def decode_batch(streams, out: str = "srgb8", as_numpy: bool = True,
                 max_inflight: int = 4, batch: int = 1) -> list:
    """Decode a batch of bitstreams through the pipeline; returns a list
    of (3, H, W)/(H, W, 3)-shaped arrays (device arrays unless
    as_numpy)."""
    pipe = DecodePipeline(out=out, max_inflight=max_inflight,
                          batch=batch)
    try:
        futs = [pipe.submit(s) for s in streams]
        pipe.flush()
        outs = [f.result() for f in futs]
    finally:
        pipe.close()
    if as_numpy:
        outs = [np.asarray(o) for o in outs]
    return outs
