"""Multi-chip parallel layer.

Reference analogue: lib/jxl/base/data_parallel.h + lib/threads/ thread
pools — libjxl's only parallelism is shared-memory section fan-out
(SURVEY.md §2.11). TPU-native replacement: the image/space axes shard
over a jax Mesh; XLA collectives (ppermute halo exchange) ride ICI.
Host-side section parsing fans out over a thread pool feeding the
device pipeline (parallel/host_pool.py).
"""

from libjxl_tpu.parallel.runner import (
    SerialRunner, ThreadRunner, get_runner, set_runner,
)
from libjxl_tpu.parallel.sharded_decode import (
    batch_feeds, batch_feeds2, make_sharded_decode, make_sharded_decode2,
)

__all__ = ["batch_feeds", "batch_feeds2", "make_sharded_decode",
           "make_sharded_decode2"]
