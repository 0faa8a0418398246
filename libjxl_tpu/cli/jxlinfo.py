"""jxlinfo: dump JPEG XL codestream metadata.

Reference: tools/jxlinfo.cc. Usage:
    python -m libjxl_tpu.cli.jxlinfo input.jxl
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jxlinfo", description=__doc__)
    p.add_argument("input")
    args = p.parse_args(argv)

    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.bitstream.fields import bundle_read
    from libjxl_tpu.color.color_encoding import (
        ColorSpace, TransferFunction, WhitePoint, Primaries)
    from libjxl_tpu.frame.frame_header import (
        FrameEncoding, FrameHeader)
    from libjxl_tpu.frame.headers import read_codestream_headers

    with open(args.input, "rb") as f:
        data = f.read()
    from libjxl_tpu.container.boxes import is_container, unpack_container
    if is_container(data):
        content = unpack_container(data)
        print(f"container: level {content.level}, "
              f"codestream {len(content.codestream)} bytes"
              + (", exif" if content.exif else "")
              + (", xml" if content.xml else ""))
        data = content.codestream
    r = BitReader(data)
    meta = read_codestream_headers(r)
    m = meta.m
    bd = m.bit_depth
    print(f"dimensions: {meta.xsize}x{meta.ysize}")
    depth = f"{bd.bits_per_sample}-bit "
    depth += "float" if bd.floating_point_sample else "uint"
    print(f"bit depth: {depth}")
    print(f"xyb encoded: {m.xyb_encoded}")
    ce = m.color_encoding
    print(f"color space: {ColorSpace(ce.color_space).name}, "
          f"white point: {WhitePoint(ce.white_point).name}, "
          f"transfer: "
          f"{'gamma %.4f' % (ce.tf.gamma / 1e7) if ce.tf.have_gamma else TransferFunction(ce.tf.transfer_function).name}")
    print(f"orientation: {m.orientation}")
    if m.extra_channel_info:
        for i, eci in enumerate(m.extra_channel_info):
            print(f"extra channel {i}: type {eci.type} "
                  f"{eci.bit_depth.bits_per_sample}-bit name='{eci.name}'")
    if m.have_animation:
        a = m.animation
        print(f"animation: {a.tps_numerator}/{a.tps_denominator} tps, "
              f"loops={a.num_loops}")
    fh = FrameHeader(nonserialized_metadata=meta)
    try:
        bundle_read(r, fh)
        enc = "VarDCT" if fh.encoding == FrameEncoding.VARDCT else "Modular"
        print(f"frame: {enc}, passes={fh.passes.num_passes}, "
              f"is_last={fh.is_last}, gab={fh.loop_filter.gab}, "
              f"epf={fh.loop_filter.epf_iters}")
    except Exception:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
