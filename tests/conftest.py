"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests validate numerics and sharding on
CPU so they run anywhere (mirrors libjxl's FakeParallelRunner idea of
testing concurrency without real hardware —
/root/reference/lib/jxl/fake_parallel_runner_testonly.h:23).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
