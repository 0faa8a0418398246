"""Benchmark: batched VarDCT group decode throughput on device.

Measures the fused dequant+CfL+IDCT+XYB->sRGB8 device pipeline over
256x256 groups (the libjxl hot decode path, SURVEY.md §3.1) and prints
one JSON line. Baseline: the reference's multithreaded decode design
target of ~400 MPix/s (doc/xl_overview.md:7-9, BASELINE.md).

Methodology note: on the axon-tunnelled TPU, block_until_ready does not
synchronize, so we force a device-side scalar reduction + host fetch as
a barrier and subtract the single-dispatch round-trip latency.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libjxl_tpu.ops.decode_tpu import (
        decode_groups_to_srgb8, example_inputs)

    num_groups = 64  # 64 groups of 256x256 = 4.19 MPix per step
    args = example_inputs(num_groups=num_groups, blocks=32)
    args = tuple(jax.device_put(a) for a in args)

    sync = jax.jit(lambda x: x.astype(jnp.int32).sum())

    # Warmup / compile.
    float(sync(decode_groups_to_srgb8(*args)))

    def run(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = decode_groups_to_srgb8(*args)
        float(sync(out))
        return time.perf_counter() - t0

    base = min(run(1) for _ in range(3))
    iters = 50
    total = min(run(iters + 1) for _ in range(3))
    dt = max((total - base) / iters, 1e-9)

    mpix_per_s = num_groups * 256 * 256 / 1e6 / dt
    baseline = 400.0  # MPix/s, reference design target
    print(json.dumps({
        "metric": "batched_vardct_group_decode_throughput",
        "value": round(mpix_per_s, 2),
        "unit": "MPix/s",
        "vs_baseline": round(mpix_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
