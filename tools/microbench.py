"""Microbenchmarks for the hot kernels (gbench analogue:
dct_gbench.cc, tf_gbench.cc, splines_gbench.cc,
dec_external_image_gbench.cc). Run from the repo root:

    python tools/microbench.py [--device]

Prints one line per kernel: name, items/s, per-call latency.
--device benchmarks the jitted JAX kernels on the available backend
(TPU when present), otherwise everything runs on the host (numpy/C++).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def _bench(name: str, fn, items: float, unit: str, *, reps: int = 5,
           warmup: int = 1):
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    rate = items / best
    print(f"{name:<34} {rate / 1e6:10.2f} M{unit}/s   {best * 1e3:8.3f} ms")


def bench_dct():
    from libjxl_tpu.vardct.dct import dct_matrix
    rng = np.random.default_rng(0)
    n = 16384
    blocks = rng.normal(size=(n, 8, 8)).astype(np.float32)
    m8 = dct_matrix(8)

    def run():
        np.einsum("ui,nij,wj->nuw", m8, blocks, m8, optimize=True)
    _bench("dct8x8 batched einsum", run, n * 64, "coeff")


def bench_ans_decode():
    from libjxl_tpu.api.simple import decode, encode
    rng = np.random.default_rng(1)
    img = np.clip(rng.normal(128, 30, (512, 512, 3)),
                  0, 255).astype(np.uint8)
    data = encode(img, distance=1.0, effort=5)

    def run():
        decode(data)
    _bench("vardct full host decode (512^2)", run, 512 * 512, "pix")


def bench_modular_decode():
    from libjxl_tpu.api.simple import decode, encode
    rng = np.random.default_rng(2)
    img = np.clip(rng.normal(128, 30, (512, 512, 3)),
                  0, 255).astype(np.uint8)
    data = encode(img, lossless=True, effort=1)

    def run():
        decode(data)
    _bench("modular lossless decode (512^2)", run, 512 * 512, "pix")


def bench_fast_lossless():
    from libjxl_tpu.api.simple import decode, encode
    rng = np.random.default_rng(4)
    y, x = np.mgrid[0:1024, 0:1024]
    img = np.clip((128 + 90 * np.sin(x / 31) * np.cos(y / 41))[..., None]
                  + rng.normal(0, 5, (1024, 1024, 3)), 0,
                  255).astype(np.uint8)
    data = encode(img, lossless=True, effort=1)

    def enc():
        encode(img, lossless=True, effort=1)
    _bench("fast-lossless e1 encode (1 MPix)", enc, 1024 * 1024, "pix")

    def dec():
        decode(data)
    _bench("fast-lossless e1 decode (1 MPix)", dec, 1024 * 1024, "pix")


def bench_low_memory():
    from libjxl_tpu.api.simple import encode
    from libjxl_tpu.frame.low_memory import decode_low_memory
    rng = np.random.default_rng(5)
    img = np.clip(rng.normal(128, 30, (768, 768, 3)),
                  0, 255).astype(np.uint8)
    data = encode(img, distance=1.0, effort=5)

    def run():
        decode_low_memory(data, lambda y0, rows: None)
    _bench("low-memory row-streamed decode (768^2)", run, 768 * 768,
           "pix")


def bench_transfer_functions():
    from libjxl_tpu.color.transfer_functions import (
        pq_display_from_encoded, pq_encoded_from_display)
    from libjxl_tpu.color.xyb import linear_to_srgb, srgb_to_linear
    x = np.random.default_rng(3).random((1024, 1024)).astype(np.float32)
    _bench("srgb_to_linear", lambda: srgb_to_linear(x), x.size, "px")
    _bench("linear_to_srgb", lambda: linear_to_srgb(x), x.size, "px")
    _bench("pq eotf", lambda: pq_display_from_encoded(x), x.size, "px")
    _bench("pq inv-eotf", lambda: pq_encoded_from_display(x),
           x.size, "px")


def bench_epf():
    from libjxl_tpu.frame.frame_header import LoopFilter
    from libjxl_tpu.pipeline.loop_filters import epf1
    rng = np.random.default_rng(4)
    img = rng.normal(size=(3, 512, 512)).astype(np.float32)
    sig = np.full((64, 64), 2.0, np.float32)
    lf = LoopFilter()
    _bench("epf1 (5x5, 512^2)", lambda: epf1(img, lf, sig),
           512 * 512, "px")


def bench_splines():
    from libjxl_tpu.frame.splines import (
        Splines, quantize_spline, render_splines)
    from libjxl_tpu.vardct.cfl import ColorCorrelation
    sp = Splines()
    sp.quantization_adjustment = 0
    for i in range(8):
        color_dct = np.zeros((3, 32), np.float64)
        color_dct[1, 0] = 1.0
        sigma_dct = np.zeros(32, np.float64)
        sigma_dct[0] = 4.0
        cps = [(10.0 + 25.0 * j, 10.0 + 28.0 * i + 3.0 * j)
               for j in range(5)]
        sp.splines.append(quantize_spline(cps, color_dct, sigma_dct,
                                          0, 0.0, 1.0))
        sp.starting_points.append(cps[0])
    img = np.zeros((3, 256, 256), np.float32)

    def run():
        render_splines(sp, img.copy(), ColorCorrelation())
    _bench("splines render (8 strokes)", run, 256 * 256, "px")


def bench_device():
    import jax

    from libjxl_tpu.api.simple import encode
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.frame.decode_frame import decode_frame
    from libjxl_tpu.frame.headers import read_codestream_headers
    from libjxl_tpu.tpu.pipeline import decode_frame_device2
    rng = np.random.default_rng(5)
    img = np.clip(rng.normal(128, 30, (1024, 1024, 3)),
                  0, 255).astype(np.uint8)
    data = encode(img, distance=1.0, effort=5)
    r = BitReader(data)
    meta = read_codestream_headers(r)
    feed = decode_frame(r, meta, device="feed").feed

    def run():
        out = decode_frame_device2(feed, 1024, 1024, as_numpy=False)
        jax.block_until_ready(out)
    _bench(f"device decode ({jax.devices()[0].platform})", run,
           1024 * 1024, "pix", warmup=2)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="microbench", description=__doc__)
    p.add_argument("--device", action="store_true",
                   help="also run the jitted device pipeline benchmark")
    args = p.parse_args(argv)
    bench_dct()
    bench_transfer_functions()
    bench_epf()
    bench_splines()
    bench_ans_decode()
    bench_modular_decode()
    bench_fast_lossless()
    bench_low_memory()
    if args.device:
        bench_device()
    return 0


if __name__ == "__main__":
    sys.exit(main())
