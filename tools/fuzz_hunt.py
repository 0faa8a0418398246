"""Offline fuzz hunt: randomized + structured mutations over diverse
valid streams, saving any input whose decode escapes JxlError into
tests/corpus/ (the committed crash corpus that
tests/test_corpus_replay.py replays on every run).

Reference analogue: tools/djxl_fuzzer.cc + djxl_fuzzer_test.cc (crash
corpus replayed as a gtest).

Usage: python tools/fuzz_hunt.py [--seconds 300] [--seed 0]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CORPUS = os.path.join(REPO, "tests", "corpus")

from libjxl_tpu.base.errors import JxlError  # noqa: E402


def seed_streams() -> list:
    """Diverse valid streams covering the major codestream shapes."""
    from libjxl_tpu.api.simple import encode, encode_animation
    rng = np.random.default_rng(7)
    img = np.clip(rng.normal(128, 48, (64, 72, 3)), 0, 255).astype(np.uint8)
    gray16 = rng.integers(0, 65536, (48, 40), dtype=np.uint16)
    small = img[:24, :24]
    streams = [
        ("vardct_e3", encode(img, distance=1.0, effort=3)),
        ("vardct_prog", encode(img, distance=2.0, progressive=True)),
        ("modular_lossless", encode(small, lossless=True)),
        ("modular_gray16", encode(gray16, lossless=True)),
        ("container", encode(small, distance=1.0, container=True)),
        ("noise", encode(img, distance=1.0, noise=3200.0)),
        ("anim", encode_animation([small, small[::-1]], distance=1.5)),
        ("e1_fast", encode(small, lossless=True, effort=1)),
        ("upsample2", encode(img, distance=1.0, resampling=2)),
        ("ycbcr420", encode(img, distance=1.0,
                            chroma_subsampling="420")),
    ]
    return streams


def entry_points():
    from tests.test_fuzz import ENTRY_POINTS
    return ENTRY_POINTS


def save_crash(data: bytes, name: str, err: BaseException) -> str:
    os.makedirs(CORPUS, exist_ok=True)
    h = hashlib.sha1(data).hexdigest()[:12]
    path = os.path.join(CORPUS, f"crash-{name}-{h}.bin")
    with open(path, "wb") as f:
        f.write(data)
    with open(path + ".txt", "w") as f:
        f.write("".join(traceback.format_exception(err)))
    return path


def write_seeds() -> int:
    """Deterministic seed corpus: every stream shape truncated at
    structural fractions and header-flipped — the regression baseline
    the replay test runs even before any hunted crash lands."""
    os.makedirs(CORPUS, exist_ok=True)
    n = 0
    for name, data in seed_streams():
        cases = {
            f"seed-{name}": data,
            f"seed-{name}-t25": data[:len(data) // 4],
            f"seed-{name}-t75": data[:3 * len(data) // 4],
        }
        flip = bytearray(data)
        flip[min(18, len(flip) - 1)] ^= 0x40   # inside size header
        cases[f"seed-{name}-hdrflip"] = bytes(flip)
        for cname, cdata in cases.items():
            with open(os.path.join(CORPUS, cname + ".bin"), "wb") as f:
                f.write(cdata)
            n += 1
    print(f"wrote {n} seed corpus files")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=300.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--write-seeds", action="store_true")
    args = p.parse_args(argv)
    if args.write_seeds:
        return write_seeds()

    eps = entry_points()
    seeds = seed_streams()
    rng = np.random.default_rng(args.seed)
    found = 0
    iters = 0
    t_end = time.time() + args.seconds
    while time.time() < t_end:
        iters += 1
        mode = rng.integers(0, 10)
        if mode == 0:
            data = rng.integers(0, 256, rng.integers(1, 512),
                                dtype=np.uint8).tobytes()
            sname = "rand"
        else:
            sname, base = seeds[int(rng.integers(0, len(seeds)))]
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                op = rng.integers(0, 4)
                if op == 0 and len(buf) > 1:          # flip
                    buf[int(rng.integers(0, len(buf)))] ^= \
                        int(rng.integers(1, 256))
                elif op == 1 and len(buf) > 4:        # truncate
                    buf = buf[:int(rng.integers(1, len(buf)))]
                elif op == 2:                         # insert
                    i = int(rng.integers(0, len(buf) + 1))
                    buf[i:i] = bytes([int(rng.integers(0, 256))])
                elif op == 3 and len(buf) > 8:        # splice chunk
                    i = int(rng.integers(0, len(buf) - 4))
                    j = int(rng.integers(0, len(buf) - 4))
                    buf[i:i + 4] = buf[j:j + 4]
            data = bytes(buf)
        name, fn = list(eps.items())[int(rng.integers(0, len(eps)))]
        try:
            fn(data)
        except JxlError:
            pass
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # noqa: BLE001 — crash found
            found += 1
            path = save_crash(data, f"{name}-{sname}", e)
            print(f"CRASH [{type(e).__name__}] {name} on {sname}: {path}")
    print(f"{iters} inputs, {found} crashes")
    return 1 if found else 0


if __name__ == "__main__":
    sys.exit(main())
