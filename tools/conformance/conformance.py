"""Conformance checker: decode .jxl files and compare against reference
.npy images (reference: tools/conformance/conformance.py CompareNPY —
per-frame max-channel RMSE and peak absolute error limits, ISO 18181-3
style).

Usage:
    python tools/conformance/conformance.py check input.jxl ref.npy \
        [--rmse 0.001] [--peak 0.005]
    python tools/conformance/conformance.py decode input.jxl out.npy
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def decode_to_npy(jxl_path: str, npy_path: str) -> np.ndarray:
    from libjxl_tpu.api import decode
    with open(jxl_path, "rb") as f:
        res = decode(f.read())
    arr = res.pixels
    if np.issubdtype(arr.dtype, np.integer):
        maxval = np.iinfo(arr.dtype).max
        arr = arr.astype(np.float32) / maxval
    np.save(npy_path, arr)
    return arr


def compare(decoded: np.ndarray, reference: np.ndarray,
            rmse_limit: float, peak_limit: float) -> tuple[bool, str]:
    if decoded.shape != reference.shape:
        return False, (f"shape mismatch {decoded.shape} vs "
                       f"{reference.shape}")
    diff = decoded.astype(np.float64) - reference.astype(np.float64)
    # Per-channel RMSE, take the worst channel (CompareNPY semantics).
    rmse = np.sqrt(np.mean(diff ** 2, axis=(0, 1)))
    peak = np.abs(diff).max()
    ok = rmse.max() <= rmse_limit and peak <= peak_limit
    msg = (f"max-channel RMSE {rmse.max():.6f} (limit {rmse_limit}), "
           f"peak error {peak:.6f} (limit {peak_limit})")
    return ok, msg


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pd = sub.add_parser("decode")
    pd.add_argument("input")
    pd.add_argument("output")
    pc = sub.add_parser("check")
    pc.add_argument("input")
    pc.add_argument("reference")
    pc.add_argument("--rmse", type=float, default=0.001)
    pc.add_argument("--peak", type=float, default=0.005)
    args = p.parse_args(argv)

    if args.cmd == "decode":
        arr = decode_to_npy(args.input, args.output)
        print(f"decoded {arr.shape} -> {args.output}")
        return 0
    decoded = decode_to_npy(args.input, "/tmp/_conformance_tmp.npy")
    reference = np.load(args.reference)
    ok, msg = compare(decoded, reference, args.rmse, args.peak)
    print(("PASS: " if ok else "FAIL: ") + msg)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.path.insert(0, ".")
    sys.exit(main())
