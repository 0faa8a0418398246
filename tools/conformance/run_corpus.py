"""Runs the conformance corpus: every .jxl must decode to its golden
.npy within the manifest's limits (reference: conformance.py)."""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np


def main(corpus: str) -> int:
    from libjxl_tpu.api import decode

    with open(os.path.join(corpus, "manifest.json")) as f:
        manifest = json.load(f)
    failures = 0
    for name, limits in sorted(manifest.items()):
        with open(os.path.join(corpus, name + ".jxl"), "rb") as f:
            data = f.read()
        if limits.get("animation"):
            from libjxl_tpu.api import decode_all
            arr = decode_all(data)[0][-1].pixels
        else:
            arr = decode(data).pixels
        maxval = 255 if arr.dtype == np.uint8 else 65535
        got = arr.astype(np.float64) / maxval
        ref = np.load(os.path.join(corpus, name + ".npy"))
        diff = got - ref
        rmse = float(np.sqrt((diff ** 2).mean()))
        peak = float(np.abs(diff).max())
        # float32 golden storage leaves ~1e-7 quantization noise
        ok = rmse <= limits["rmse"] + 1e-6 and \
            peak <= limits["peak"] + 1e-6
        print(f"{'PASS' if ok else 'FAIL'} {name}: rmse={rmse:.6f} "
              f"peak={peak:.6f}")
        failures += not ok
    return 1 if failures else 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "conformance_corpus"))
