"""butteraugli_main: psychovisual distance between two images.

Reference: tools/butteraugli_main.cc. Usage:
    python -m libjxl_tpu.cli.butteraugli_main orig.png distorted.png
       [--pnorm P] [--intensity_target N]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="butteraugli", description=__doc__)
    p.add_argument("image1")
    p.add_argument("image2")
    p.add_argument("--pnorm", type=float, default=None,
                   help="also print the p-norm of the diffmap")
    p.add_argument("--intensity_target", type=float, default=80.0)
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from libjxl_tpu.metrics.butteraugli import (
        butteraugli_distance, butteraugli_pnorm,
    )

    a = np.asarray(Image.open(args.image1).convert("RGB"))
    b = np.asarray(Image.open(args.image2).convert("RGB"))
    score, dmap = butteraugli_distance(
        a, b, intensity_target=args.intensity_target, return_diffmap=True)
    print(f"{score:.8f}")
    if args.pnorm is not None:
        print(f"{args.pnorm}-norm: {butteraugli_pnorm(dmap, args.pnorm):.8f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
