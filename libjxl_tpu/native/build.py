"""Build the native module: g++ -O3 -shared."""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "jxl_native.cpp")
OUT = os.path.join(_DIR, "jxl_native.so")


def build(force: bool = False) -> str | None:
    if not force and os.path.exists(OUT) and \
            os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           SRC, "-o", OUT]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native build failed: {msg}", file=sys.stderr)
        return None
    return OUT


if __name__ == "__main__":
    path = build(force=True)
    print(f"built: {path}" if path else "build failed")
    sys.exit(0 if path else 1)
