"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests validate numerics and sharding on
CPU so they run anywhere (mirrors libjxl's FakeParallelRunner idea of
testing concurrency without real hardware —
/root/reference/lib/jxl/fake_parallel_runner_testonly.h:23).

NOTE: this image's jax build pins jax_platforms to the axon TPU plugin
and ignores the JAX_PLATFORMS env var, so we override the config
directly before any backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
