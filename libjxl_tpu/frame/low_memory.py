"""Low-memory row-streaming decode: O(group-row) peak memory.

Analogue of lib/jxl/render_pipeline/low_memory_render_pipeline.h: the
frame is decoded one 256-px group row (band) at a time — AC group
coefficients are freed as soon as their band renders, and loop filters
run on a band extended by a 16-px halo of real neighbor rows (anything
closer than the filter support to a band edge comes out of the halo;
true image edges mirror as usual). Peak memory is two unfiltered pixel
bands + the DC/control maps instead of the whole-frame float buffers
of the one-shot decoder (a 16K x 16K image: ~100 MB instead of ~3 GB).

Profile: single-pass VarDCT, 4:4:4, no patches/splines/noise, no
upsampling, XYB color. Other streams raise NotSupported and callers
fall back to the one-shot decoder.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.frame.incremental import (
    IncrementalFrameDecoder, NotSupported,
)

_HALO = 16   # px; >= total gaborish+EPF support, block aligned


def decode_low_memory(data: bytes, callback) -> tuple:
    """Decode `data` (codestream or container), invoking
    ``callback(y0, rows)`` with consecutive (h, W, 3) uint8 sRGB bands.
    Returns (height, width)."""
    from libjxl_tpu.api.simple import is_container, unpack_container
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.frame.frame_header import FrameFlags
    from libjxl_tpu.frame.headers import read_codestream_headers

    if is_container(data):
        data = unpack_container(data).codestream
    r = BitReader(data)
    meta = read_codestream_headers(r)
    if not meta.m.xyb_encoded or meta.m.num_extra_channels:
        raise NotSupported("low-memory profile is XYB color only")

    inc = IncrementalFrameDecoder(meta)
    if not inc.init(data, r.bits_consumed):
        raise NotSupported("truncated input")
    fh, fd = inc.fh, inc.fd
    if fh.passes.num_passes != 1:
        raise NotSupported("multi-pass outside low-memory profile")
    if fh.flags & (FrameFlags.PATCHES | FrameFlags.SPLINES
                   | FrameFlags.NOISE):
        raise NotSupported("image features outside low-memory profile")

    if inc._single:
        # One-section frame (small image): all sections share one
        # sequential reader; memory is bounded by the single group
        # anyway.
        r1 = inc._section(data, 0)
        inc._decode_lf_global(r1)
        for g in range(fd.num_dc_groups):
            inc._decode_dc_group(r1, g)
        inc._assemble_maps()
        inc._decode_ac_global(r1)
        seq_reader = r1
    else:
        inc._decode_lf_global(inc._section(data, 0))
        for g in range(fd.num_dc_groups):
            inc._decode_dc_group(inc._section(data, 1 + g), g)
        inc._assemble_maps()
        inc._decode_ac_global(inc._section(data, 1 + fd.num_dc_groups))
        seq_reader = None

    from libjxl_tpu.color.xyb import linear_to_srgb, xyb_to_linear_rgb
    from libjxl_tpu.pipeline.loop_filters import apply_loop_filters
    from libjxl_tpu.vardct.reconstruct import (
        b_qm_multiplier, reconstruct_group, x_qm_multiplier,
    )

    x_mul = 1.0 / x_qm_multiplier(fh.x_qm_scale)
    b_mul = 1.0 / b_qm_multiplier(fh.b_qm_scale)
    gd = fd.group_dim
    groups_x = -(-fd.xsize // gd)
    groups_y = -(-fd.ysize // gd)
    W = fd.xsize
    lfp = fh.loop_filter
    use_filters = lfp.gab or lfp.epf_iters > 0

    def render_band(row: int) -> np.ndarray:
        """Decode + reconstruct one unfiltered band (3, bh, W),
        freeing coefficients as it goes."""
        y0 = row * gd
        bh = min(gd, fd.ysize - y0)
        band = np.zeros((3, bh, W), np.float32)
        for gx in range(groups_x):
            g = row * groups_x + gx
            idx = 2 + fd.num_dc_groups + g
            rg = seq_reader if seq_reader is not None \
                else inc._section(data, idx)
            inc._decode_ac_group(rg, 0, g)
            blocks = inc._group_blocks[g]
            brect = fd.block_group_rect(g)
            sl = brect.slices()
            pix = reconstruct_group(
                blocks, brect.xsize, brect.ysize, inc.quantizer,
                inc.raw_quant[sl],
                inc.dc_full[:, brect.y0:brect.y1, brect.x0:brect.x1],
                inc.cmap, inc.ytox_map, inc.ytob_map, brect.x0,
                brect.y0, x_mul, b_mul)
            inc._group_blocks[g] = None   # free coefficients
            x0 = gx * gd
            w_ = min(gd, W - x0)
            band[:, :, x0:x0 + w_] = pix[:, :bh, :w_]
        return band

    def emit(xyb_rows: np.ndarray, y0: int) -> None:
        srgb = linear_to_srgb(xyb_to_linear_rgb(xyb_rows))
        rows = np.clip(np.round(srgb * 255.0), 0, 255).astype(np.uint8)
        callback(y0, rows.transpose(1, 2, 0))

    prev_band = None       # unfiltered band r-1 (3, h, W)
    prev_tail = None       # last _HALO unfiltered rows of band r-2
    prev_y0 = 0

    def filter_and_emit(band, y0, top_tail, bot_head):
        if not use_filters:
            emit(band, y0)
            return
        parts = []
        top_h = 0
        if top_tail is not None:
            parts.append(top_tail)
            top_h = top_tail.shape[1]
        parts.append(band)
        if bot_head is not None:
            parts.append(bot_head)
        ext = np.ascontiguousarray(np.concatenate(parts, axis=1))
        by0 = (y0 - top_h) // 8
        rq = inc.raw_quant[by0:by0 + ext.shape[1] // 8 + 1]
        sh = inc.sharpness[by0:by0 + ext.shape[1] // 8 + 1]
        st = inc.strategies[by0:by0 + ext.shape[1] // 8 + 1]
        filt = apply_loop_filters(ext, lfp, rq, st, inc.quantizer, fd,
                                  sharpness=sh)
        emit(filt[:, top_h:top_h + band.shape[1]], y0)

    for row in range(groups_y):
        band = render_band(row)
        if prev_band is not None:
            filter_and_emit(prev_band, prev_y0, prev_tail,
                            band[:, :_HALO])
            prev_tail = prev_band[:, -_HALO:].copy()
        prev_band, prev_y0 = band, row * gd
    filter_and_emit(prev_band, prev_y0, prev_tail, None)
    return fd.ysize, W
