"""JPEG -> JXL transcoding (coefficient-preserving, pixel-approximate).

Reference: lib/jxl/jpeg/* + lib/extras (cjxl -j). The JPEG's quantized
DCT coefficients are carried VERBATIM into a VarDCT YCbCr frame: the
RAW quant-matrix mode stores the JPEG quant tables (rescaled into the
jxl scaled-DCT convention), the DC coefficients ride the VarDCT DC
stream with matching custom dc_quant steps, and chroma-from-luma is
signalled off. Reconstruction goes through the normal float decode
path, so output pixels match a libjpeg decode to within ~1 intensity
level (the bit-exact `jbrd` reconstruction path is future work).

Only 4:4:4 baseline JPEGs take the coefficient path; subsampled inputs
raise (re-encode from pixels instead).
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.extras.jpeg_parser import JpegError, parse_jpeg


def _jxl_from_jpeg_scale() -> np.ndarray:
    """(8, 8) ratio between jxl scaled-DCT and orthonormal JPEG DCT
    coefficients: jxl_coef = jpeg_dequant_coef * S."""
    from libjxl_tpu.vardct.dct import dct2d

    # Orthonormal JPEG IDCT basis matrix.
    u = np.arange(8)
    a = np.cos((2 * u[:, None] + 1) * u[None, :] * np.pi / 16)
    a *= np.where(u == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))[None, :]
    s = np.zeros((8, 8))
    for uu in range(8):
        for vv in range(8):
            f = np.zeros((8, 8))
            f[uu, vv] = 1.0
            block = a @ f @ a.T     # JPEG IDCT of a single coefficient
            s[uu, vv] = dct2d(block)[uu, vv]
    return s


def transcode_jpeg(data: bytes) -> bytes:
    """Baseline 4:4:4 JPEG bytes -> JXL codestream bytes."""
    from libjxl_tpu.api.simple import CodecMetadata
    from libjxl_tpu.bitstream.bit_io import BitWriter
    from libjxl_tpu.color.color_encoding import ColorEncoding
    from libjxl_tpu.frame.encode_frame import _write_vardct_sections
    from libjxl_tpu.frame.frame_header import (
        ColorTransform, FrameEncoding, FrameFlags, FrameHeader,
    )
    from libjxl_tpu.frame.headers import (
        BitDepth, write_codestream_headers,
    )
    from libjxl_tpu.vardct import ac_strategy as acs
    from libjxl_tpu.vardct.ac_context import BlockCtxMap
    from libjxl_tpu.vardct.cfl import ColorCorrelation
    from libjxl_tpu.vardct.group import CoeffBlock
    from libjxl_tpu.vardct.quant_weights import (
        MODE_RAW, DequantMatrices, QuantEncoding,
    )
    from libjxl_tpu.vardct.quantizer import Quantizer

    jd = parse_jpeg(data)
    if len(jd.components) not in (1, 3):
        raise JpegError("only YCbCr / grayscale JPEGs supported")
    if any(c.h_samp != 1 or c.v_samp != 1 for c in jd.components):
        raise JpegError("only 4:4:4 JPEGs take the coefficient path")
    if len(jd.components) == 1:
        # Grayscale: synthesize empty chroma components sharing the
        # luma quant table (all-zero coefficients cost almost nothing).
        import dataclasses as _dc
        luma = jd.components[0]
        for _ in range(2):
            c = _dc.replace(luma)
            c.coeffs = np.zeros_like(luma.coeffs)
            jd.components.append(c)

    meta = CodecMetadata()
    meta.size.set(jd.width, jd.height)
    meta.m.bit_depth = BitDepth.uint(8)
    meta.m.xyb_encoded = False
    meta.m.color_encoding = ColorEncoding.srgb(is_gray=False)
    w = BitWriter()
    write_codestream_headers(meta, w)

    fh = FrameHeader(nonserialized_metadata=meta)
    fh.encoding = FrameEncoding.VARDCT
    fh.color_transform = ColorTransform.YCBCR
    fh.flags = int(FrameFlags.SKIP_ADAPTIVE_DC_SMOOTHING)
    fh.loop_filter.all_default = False
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    fd = fh.to_frame_dimensions()

    s = _jxl_from_jpeg_scale()
    den = 1.0 / (64.0 * 255.0)
    # VarDCT plane order for YCbCr: (Cb, Y, Cr) (stage_ycbcr.cc rows).
    comp_for_plane = [jd.components[1], jd.components[0],
                      jd.components[2]]
    qraw = np.zeros((3, 64), np.int64)
    dc_quant = np.zeros(3, np.float32)
    for p, comp in enumerate(comp_for_plane):
        q = jd.quant_tables[comp.quant_idx].reshape(8, 8)
        qraw[p] = np.maximum(
            1, np.round(q * s / (255.0 * den))).astype(np.int64).ravel()
        dc_quant[p] = q[0, 0] * s[0, 0] / 255.0

    matrices = DequantMatrices()
    matrices.encodings[0] = QuantEncoding(MODE_RAW, qraw_table=qraw,
                                          qraw_den=den)
    matrices.dc_quant = dc_quant
    matrices.inv_dc_quant = 1.0 / dc_quant
    quantizer = Quantizer(matrices, quant_dc=1, global_scale=1 << 16)
    ctx_map = BlockCtxMap()
    cmap = ColorCorrelation()
    cmap.base_correlation_b = 0.0  # no CfL for YCbCr content

    by, bx = fd.ysize_blocks, fd.xsize_blocks
    strategies = np.zeros((by, bx), np.int32)
    raw_quant = np.ones((by, bx), np.int32)
    qdc = np.zeros((3, by, bx), np.int32)
    coeff_planes = []
    for p, comp in enumerate(comp_for_plane):
        cc = np.zeros((by, bx, 64), np.int32)
        cb, cw = comp.coeffs.shape[:2]
        cc[:min(by, cb), :min(bx, cw)] = \
            comp.coeffs[:min(by, cb), :min(bx, cw)]
        qdc[p] = cc[:, :, 0]
        coeff_planes.append(cc)

    blocks_per_group: dict = {}
    for g in range(fd.num_groups):
        brect = fd.block_group_rect(g)
        blist = []
        for yy in range(brect.ysize):
            for xx in range(brect.xsize):
                aby, abx = brect.y0 + yy, brect.x0 + xx
                c3 = np.stack([coeff_planes[p][aby, abx]
                               for p in range(3)])
                c3[:, 0] = 0  # DC rides the DC stream
                blist.append(CoeffBlock(xx, yy, acs.DCT8X8, c3))
        blocks_per_group[g] = blist

    tiles_y, tiles_x = (by + 7) // 8, (bx + 7) // 8
    zeros = np.zeros((tiles_y, tiles_x), np.int32)
    _write_vardct_sections(w, fh, fd, meta, quantizer, ctx_map, cmap,
                           qdc, raw_quant, strategies, blocks_per_group,
                           zeros, zeros, None, None)
    w.align_to_byte()
    return w.get_bytes()
