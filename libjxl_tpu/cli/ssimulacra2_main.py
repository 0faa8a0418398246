"""ssimulacra2: perceptual quality score between two images.

Reference: tools/ssimulacra2_main.cc. Usage:
    python -m libjxl_tpu.cli.ssimulacra2_main orig.png distorted.png
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ssimulacra2", description=__doc__)
    p.add_argument("original")
    p.add_argument("distorted")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from libjxl_tpu.metrics import ssimulacra2

    a = np.asarray(Image.open(args.original).convert("RGB"))
    b = np.asarray(Image.open(args.distorted).convert("RGB"))
    if a.shape != b.shape:
        print("image size mismatch", file=sys.stderr)
        return 1
    print(f"{ssimulacra2(a, b):.8f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
