"""Multi-chip parallel layer.

Reference analogue: lib/jxl/base/data_parallel.h + lib/threads/ thread
pools — libjxl's only parallelism is shared-memory section fan-out
(SURVEY.md §2.11). TPU-native replacement: the group/image axes shard
over a jax Mesh; XLA collectives ride ICI. Host-side section parsing
fans out over a thread pool feeding the device pipeline.
"""

from libjxl_tpu.parallel.mesh import (
    decode_mesh, shard_groups, sharded_decode_step, sharded_codec_step,
)

__all__ = ["decode_mesh", "shard_groups", "sharded_decode_step",
           "sharded_codec_step"]
