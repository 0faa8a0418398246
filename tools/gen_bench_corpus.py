"""Pre-encode the BASELINE-config-5 bench corpus to bench_corpus/.

bench.py loads these committed streams instead of re-encoding at every
run (encoding three 4K HDR images takes ~7 min on a 1-core host, which
blew the driver's bench budget in round 3 — VERDICT.md r3 item 1).
Regenerate with:  python tools/gen_bench_corpus.py
The generation is deterministic (fixed rng seed, fixed encoder params),
so the committed streams are reproducible.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_IMAGES = 3
W4K, H4K = 3840, 2160
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "bench_corpus")


def make_image(i):
    """Photographic-style 4K test content (smooth multi-frequency bands
    + sensor noise). All trig terms are separable, computed from 1-D
    axes and combined by outer product/broadcast — elementwise trig on
    full 4K float64 grids costs ~4 s per op on this host.
    """
    rng = np.random.default_rng(7 + i)
    xs = np.arange(W4K, dtype=np.float64)
    ys = np.arange(H4K, dtype=np.float64)
    chans = []
    for c in range(3):
        f1, f2 = 29 + 10 * i + 7 * c, 41 + 6 * i + 5 * c
        sx = np.sin(xs / f1 + c)
        cy = np.cos(ys / f2 + i)
        # sin((x+y)/s) = sin(x/s)cos(y/s) + cos(x/s)sin(y/s)
        s = float(f1 + f2)
        sxy = (np.outer(np.cos(ys / s), np.sin(xs / s))
               + np.outer(np.sin(ys / s), np.cos(xs / s)))
        base = (0.28 + 0.22 * cy[:, None] * sx[None, :] + 0.10 * sxy
                + rng.normal(0, 0.012, (H4K, W4K)))
        chans.append(base)
    img = np.clip(np.stack(chans, axis=-1), 0.0, 0.9)
    return np.round(img * 65535.0).astype(np.uint16)


def encode_one(i):
    from libjxl_tpu.api.simple import encode

    os.makedirs(OUT_DIR, exist_ok=True)
    img16 = make_image(i)
    print(f"image {i} generated", flush=True)
    t0 = time.time()
    stream = encode(img16, distance=1.0, effort=5, hdr="pq",
                    progressive=True, epf=3)
    path = os.path.join(OUT_DIR, f"4k_hdr_pq_d1_e5_prog_epf3_{i}.jxl")
    with open(path, "wb") as f:
        f.write(stream)
    print(f"{path}: {len(stream)} bytes in {time.time()-t0:.1f}s",
          flush=True)


def encode_1080p():
    """1080p stream with the same profile — bench.py's fast device
    checkpoint (the 2-MPix program compiles far faster than the 4K
    one, guaranteeing a device number on a cold compile cache)."""
    from libjxl_tpu.api.simple import encode

    os.makedirs(OUT_DIR, exist_ok=True)
    w, h = 1920, 1080
    img = make_image(0)[:h, :w]
    t0 = time.time()
    stream = encode(img, distance=1.0, effort=5, hdr="pq",
                    progressive=True, epf=3)
    path = os.path.join(OUT_DIR, "1080p_hdr_pq_d1_e5_prog_epf3.jxl")
    with open(path, "wb") as f:
        f.write(stream)
    print(f"{path}: {len(stream)} bytes in {time.time()-t0:.1f}s",
          flush=True)


def main():
    if len(sys.argv) > 1:
        if sys.argv[1] == "1080p":
            encode_1080p()
            return
        encode_one(int(sys.argv[1]))
        return
    # One subprocess per image: a fresh process per encode avoids
    # allocator fragmentation (mmap/munmap churn spends minutes in
    # kernel page-zeroing on long-lived processes at 4K sizes).
    import subprocess
    for i in range(N_IMAGES):
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(i)], check=True)
    subprocess.run([sys.executable, os.path.abspath(__file__), "1080p"],
                   check=True)


if __name__ == "__main__":
    main()
