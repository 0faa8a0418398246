"""Build the native module: g++ -O3 -shared.

Sanitizer hardening (ci.sh asan/msan jobs analogue): set
JXL_NATIVE_SANITIZE=address (or address,undefined / undefined) to build
jxl_native.san.so with -fsanitize and run the suite/fuzzers against it:

    JXL_NATIVE_SANITIZE=address,undefined python -m libjxl_tpu.native.build
    LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
        JXL_NATIVE_SANITIZE=address,undefined python -m pytest tests/ -q

(The LD_PRELOAD is required because the host binary is python, not an
asan-linked executable.)
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "jxl_native.cpp")
OUT = os.path.join(_DIR, "jxl_native.so")
OUT_SAN = os.path.join(_DIR, "jxl_native.san.so")


def _sanitize_mode() -> str:
    return os.environ.get("JXL_NATIVE_SANITIZE", "")


def build(force: bool = False) -> str | None:
    san = _sanitize_mode()
    out = OUT_SAN if san else OUT
    if not force and os.path.exists(out) and \
            os.path.getmtime(out) >= os.path.getmtime(SRC):
        return out
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
           "-fPIC"]
    if san:
        cmd += [f"-fsanitize={san}", "-fno-omit-frame-pointer", "-g"]
    cmd += [SRC, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native build failed: {msg}", file=sys.stderr)
        return None
    return out


if __name__ == "__main__":
    path = build(force=True)
    print(f"built: {path}" if path else "build failed")
    sys.exit(0 if path else 1)
