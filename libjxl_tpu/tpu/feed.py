"""Host-side builder of the dense device feed for the TPU decode
pipeline.

Converts the per-group CoeffBlock lists + control fields produced by the
host entropy decoder into uniform whole-frame tensors:

  coeff_img  (3, BH*8, BW*8) int32   stored-layout coefficients, each
                                     block's grid at its anchor
  weight_img (3, BH*8, BW*8) f32     per-position dequant multiplier
                                     (table * scale * qm-mul * CfL-safe),
                                     zero at LLF slots
  llf_img    (3, BH*8, BW*8) f32     dequantized LLF values (incl. the
                                     plain DC of 8x8-class blocks)
  fx, fb     (BH, BW) f32            per-block CfL factors
  mat_ids    (BH, BW) int32          index into the 8x8-family transform
                                     matrix bank (0 = DCT8; cells covered
                                     by big blocks also 0 — overwritten)
  big[cls]   dict: per big-strategy (in_idx, out_idx) gather/scatter
                                     index tensors

The 8x8-family strategies (DCT8, IDENTITY, DCT2X2, DCT4X4, DCT4X8,
DCT8X4, AFV0-3) are all LINEAR maps coeffs->pixels; their 64x64 matrices
are probed once from the scalar oracle (vardct/reconstruct.py) so the
device path matches the host bit-for-bit in float32.
"""

from __future__ import annotations

import functools

import numpy as np

from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct.dct import llf_from_dc
from libjxl_tpu.vardct.reconstruct import transform_to_pixels

# 8x8-family strategies -> matrix-bank slots
FAMILY8 = [acs.DCT8X8, acs.IDENTITY, acs.DCT2X2, acs.DCT4X4,
           acs.DCT4X8, acs.DCT8X4, acs.AFV0, acs.AFV1, acs.AFV2, acs.AFV3]
_FAMILY8_SLOT = {s: i for i, s in enumerate(FAMILY8)}


@functools.lru_cache(maxsize=1)
def family8_matrices() -> np.ndarray:
    """(len(FAMILY8), 64, 64) float32: pixels = coeffs @ M[s].

    Probed from the scalar oracle so any transform change propagates."""
    mats = np.zeros((len(FAMILY8), 64, 64), np.float32)
    for slot, s in enumerate(FAMILY8):
        for k in range(64):
            e = np.zeros(64)
            e[k] = 1.0
            mats[slot, k] = transform_to_pixels(s, e).ravel()
    return mats


@functools.lru_cache(maxsize=None)
def big_idct_matrices(cy: int, cx: int) -> tuple[np.ndarray, np.ndarray]:
    """Separable row/col IDCT factors (fh, fh), (fw, fw) float32 for a
    plain big DCT of covered blocks (cy, cx), consuming the STORED
    (possibly transposed) coefficient grid directly."""
    from libjxl_tpu.vardct.dct import idct_matrix
    fh, fw = cy * 8, cx * 8
    ih = idct_matrix(fh).astype(np.float32)
    iw = idct_matrix(fw).astype(np.float32)
    return ih, iw


def _pow2_pad(n: int) -> int:
    return 1 if n == 0 else 1 << (n - 1).bit_length()


def build_feed(group_blocks, fd, strategies, raw_quant, dc_full, quantizer,
               cmap, ytox_map, ytob_map, x_mul, b_mul,
               biases) -> dict:
    """Assemble the device feed for one frame."""
    BH, BW = fd.ysize_blocks, fd.xsize_blocks
    H, W = BH * 8, BW * 8
    coeff_img = np.zeros((3, H, W), np.int32)
    weight_img = np.zeros((3, H, W), np.float32)
    llf_img = np.zeros((3, H, W), np.float32)

    inv_gs = quantizer.inv_global_scale
    scale_blk = (inv_gs / raw_quant.astype(np.float32))       # (BH, BW)
    qmul = np.array([x_mul, 1.0, b_mul], np.float32)

    # CfL factors per block.
    ty = np.arange(BH) // 8
    tx = np.arange(BW) // 8
    fx = (cmap.base_correlation_x
          + ytox_map[ty[:, None], tx[None, :]] * cmap.color_scale
          ).astype(np.float32)
    fb = (cmap.base_correlation_b
          + ytob_map[ty[:, None], tx[None, :]] * cmap.color_scale
          ).astype(np.float32)

    mat_ids = np.zeros((BH, BW), np.int32)
    big_lists: dict = {}

    # Place per-group blocks into the frame tensors.
    for g in range(fd.num_groups):
        brect = fd.block_group_rect(g)
        blocks = group_blocks[g]
        if blocks is None:
            continue
        for blk in blocks:
            s = int(blk.strategy)
            aby, abx = brect.y0 + blk.by, brect.x0 + blk.bx
            cx, cy = acs.covered_blocks(s)
            ly, lx = acs.coefficient_layout(cy, cx)
            size = cy * cx * 64
            y0, x0 = aby * 8, abx * 8
            # The block's LINEAR coefficient buffer (stored layout
            # row-major) maps row-major onto the COVERED pixel rect —
            # for tall blocks the stored grid is wide, so the linear
            # view is the only shape that fits both.
            cov = (slice(y0, y0 + cy * 8), slice(x0, x0 + cx * 8))
            coeff_img[:, cov[0], cov[1]] = \
                blk.coeffs.reshape(3, cy * 8, cx * 8)
            table = quantizer.dequant.table(s).reshape(3, size)
            wgt = (table * scale_blk[aby, abx] * qmul[:, None]
                   ).astype(np.float32)
            dcs = dc_full[:, aby:aby + cy, abx:abx + cx]
            if cx * cy > 1:
                llf_lin = np.zeros((3, ly * 8, lx * 8), np.float32)
                for c in range(3):
                    # LLF from DC, stored transposed when cy >= cx.
                    llf = llf_from_dc(dcs[c].astype(np.float64),
                                      cy * 8, cx * 8)
                    if cy >= cx:
                        llf = llf.T
                    llf_lin[c, :ly, :lx] = llf
                llf_mask = np.zeros((ly * 8, lx * 8), bool)
                llf_mask[:ly, :lx] = True
                wgt = wgt.copy()
                wgt[:, llf_mask.ravel()] = 0.0
                llf_img[:, cov[0], cov[1]] = \
                    llf_lin.reshape(3, size).reshape(3, cy * 8, cx * 8)
                # One CfL factor per block: the anchor tile's
                # (dec_group.cc x_cc_mul is per-block, from the anchor).
                fx[aby:aby + cy, abx:abx + cx] = fx[aby, abx]
                fb[aby:aby + cy, abx:abx + cx] = fb[aby, abx]
                big_lists.setdefault((cy, cx), []).append((aby, abx))
            else:
                llf_img[:, y0, x0] = dcs[:, 0, 0]
                wgt = wgt.copy()
                wgt[:, 0] = 0.0
                mat_ids[aby, abx] = _FAMILY8_SLOT[s]
            weight_img[:, cov[0], cov[1]] = \
                wgt.reshape(3, cy * 8, cx * 8)

    # Per-big-class gather/scatter index tensors (into flattened (H, W)).
    big = {}
    for (cy, cx), anchors in sorted(big_lists.items()):
        ly, lx = acs.coefficient_layout(cy, cx)
        n = len(anchors)
        cap = _pow2_pad(n)
        # The stored-layout grid is read back by walking the covered
        # rect row-major (the linear order the coefficients were
        # placed in) and reshaping to (ly*8, lx*8).
        cov_lin = (np.arange(cy * 8)[:, None] * W
                   + np.arange(cx * 8)[None, :]).ravel()
        in_shape = cov_lin.reshape(ly * 8, lx * 8)
        out_shape = cov_lin.reshape(cy * 8, cx * 8)
        in_idx = np.zeros((cap, ly * 8, lx * 8), np.int64)
        out_idx = np.zeros((cap, cy * 8, cx * 8), np.int64)
        for i, (aby, abx) in enumerate(anchors):
            base = aby * 8 * W + abx * 8
            in_idx[i] = base + in_shape
            out_idx[i] = base + out_shape
        # Padding entries self-gather/scatter block 0's area but carry a
        # mask so their scatter writes the already-correct base value.
        for i in range(n, cap):
            in_idx[i] = in_idx[0]
            out_idx[i] = out_idx[0]
        mask = np.zeros(cap, np.float32)
        mask[:n] = 1.0
        big[(cy, cx)] = (in_idx, out_idx, mask)

    return dict(coeff_img=coeff_img, weight_img=weight_img, llf_img=llf_img,
                fx=fx, fb=fb, mat_ids=mat_ids, big=big,
                biases=np.asarray(biases, np.float32))
