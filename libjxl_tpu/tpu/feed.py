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
    """Assemble the device feed for one frame (vectorized per strategy
    class — the per-block Python loop only collects anchors)."""
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

    # One pass: bucket blocks by strategy class.
    fam_by_slot: dict = {}
    big_by_key: dict = {}
    for g in range(fd.num_groups):
        brect = fd.block_group_rect(g)
        blocks = group_blocks[g]
        if blocks is None:
            continue
        gy0, gx0 = brect.y0, brect.x0
        for blk in blocks:
            s = int(blk.strategy)
            slot = _FAMILY8_SLOT.get(s)
            if slot is not None:
                fam_by_slot.setdefault(slot, ([], []))
                lst = fam_by_slot[slot]
                lst[0].append((gy0 + blk.by, gx0 + blk.bx))
                lst[1].append(blk.coeffs)
            else:
                big_by_key.setdefault(s, ([], []))
                lst = big_by_key[s]
                lst[0].append((gy0 + blk.by, gx0 + blk.bx))
                lst[1].append(blk.coeffs)

    cv = coeff_img.reshape(3, BH, 8, BW, 8)
    wv = weight_img.reshape(3, BH, 8, BW, 8)
    lv = llf_img.reshape(3, BH, 8, BW, 8)

    # --- 8x8 family, vectorized per slot ---
    for slot, (anchors, coeffs) in fam_by_slot.items():
        ab = np.asarray(anchors, np.int64)
        bys, bxs = ab[:, 0], ab[:, 1]
        cf = np.stack(coeffs)                      # (n, 3, 64)
        table = quantizer.dequant.table(FAMILY8[slot]).reshape(3, 64)
        wgt = (table[None] * scale_blk[bys, bxs][:, None, None]
               * qmul[None, :, None]).astype(np.float32)
        wgt[:, :, 0] = 0.0
        # scatter (n,3,8,8) into the cell view
        cv[:, bys, :, bxs, :] = cf.reshape(-1, 3, 8, 8)
        wv[:, bys, :, bxs, :] = wgt.reshape(-1, 3, 8, 8)
        llf = np.zeros((len(bys), 3, 8, 8), np.float32)
        llf[:, :, 0, 0] = dc_full[:, bys, bxs].T
        lv[:, bys, :, bxs, :] = llf
        mat_ids[bys, bxs] = slot

    # --- big/rect classes ---
    big = {}
    for s, (anchors, coeffs) in sorted(big_by_key.items()):
        cx, cy = acs.covered_blocks(s)
        ly, lx = acs.coefficient_layout(cy, cx)
        size = cy * cx * 64
        ab = np.asarray(anchors, np.int64)
        bys, bxs = ab[:, 0], ab[:, 1]
        n = len(bys)
        cf = np.stack(coeffs).reshape(n, 3, size)
        table = quantizer.dequant.table(s).reshape(3, size)
        wgt = (table[None] * scale_blk[bys, bxs][:, None, None]
               * qmul[None, :, None]).astype(np.float32)
        # zero the LLF slots (first ly x lx of the stored grid)
        llf_mask = np.zeros((ly * 8, lx * 8), bool)
        llf_mask[:ly, :lx] = True
        wgt[:, :, llf_mask.ravel()] = 0.0
        # batched LLF from DC (llf_from_dc, vectorized)
        dcs = np.stack([dc_full[:, by:by + cy, bx:bx + cx]
                        for by, bx in zip(bys, bxs)])   # (n,3,cy,cx)
        from libjxl_tpu.vardct.dct import dct_matrix, resample_scales
        mcy = dct_matrix(cy) if cy > 1 else np.ones((1, 1))
        mcx = dct_matrix(cx) if cx > 1 else np.ones((1, 1))
        coefdc = np.einsum("ui,ncij,vj->ncuv", mcy,
                           dcs.astype(np.float64), mcx, optimize=True)
        sy = resample_scales(cy, cy * 8)
        sx = resample_scales(cx, cx * 8)
        llf = coefdc * sy[None, None, :, None] * sx[None, None, None, :]
        if cy >= cx:
            llf = llf.transpose(0, 1, 3, 2)
        llf_lin = np.zeros((n, 3, ly * 8, lx * 8), np.float32)
        llf_lin[:, :, :ly, :lx] = llf
        # place linear buffers into covered rects (still per block, but
        # big blocks are few)
        for i in range(n):
            by, bx = int(bys[i]), int(bxs[i])
            covy = slice(by * 8, (by + cy) * 8)
            covx = slice(bx * 8, (bx + cx) * 8)
            coeff_img[:, covy, covx] = cf[i].reshape(3, cy * 8, cx * 8)
            weight_img[:, covy, covx] = wgt[i].reshape(3, cy * 8, cx * 8)
            llf_img[:, covy, covx] = \
                llf_lin[i].reshape(3, size).reshape(3, cy * 8, cx * 8)
            fx[by:by + cy, bx:bx + cx] = fx[by, bx]
            fb[by:by + cy, bx:bx + cx] = fb[by, bx]
        big.setdefault((cy, cx), []).extend(
            (int(b), int(x)) for b, x in zip(bys, bxs))

    # Per-big-class gather/scatter index tensors (into flattened (H, W)).
    big_out = {}
    for (cy, cx), anchors in sorted(big.items()):
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
        mask = np.zeros(cap, np.float32)
        mask[:n] = 1.0
        big_out[(cy, cx)] = (in_idx, out_idx, mask)

    return dict(coeff_img=coeff_img, weight_img=weight_img, llf_img=llf_img,
                fx=fx, fb=fb, mat_ids=mat_ids, big=big_out,
                biases=np.asarray(biases, np.float32))


# ---------------------------------------------------------------------------
# Slim feed (v2): small control planes; weights/LLF computed on device.

def build_feed2(group_blocks, fd, strategies, raw_quant, dc_full, quantizer,
                cmap, ytox_map, ytob_map, x_mul, b_mul, biases) -> dict:
    """Slim device feed: the coefficient image plus per-block control
    maps; dequant weights and LLF values are reconstructed ON DEVICE
    (tpu/pipeline.py decode_xyb2) so the host->device transfer carries
    ~6 bytes/pixel instead of ~40."""
    BH, BW = fd.ysize_blocks, fd.xsize_blocks
    H, W = BH * 8, BW * 8
    coeff_img = np.zeros((3, H, W), np.int32)

    ty = np.arange(BH) // 8
    tx = np.arange(BW) // 8
    fx = (cmap.base_correlation_x
          + ytox_map[ty[:, None], tx[None, :]] * cmap.color_scale
          ).astype(np.float32)
    fb = (cmap.base_correlation_b
          + ytob_map[ty[:, None], tx[None, :]] * cmap.color_scale
          ).astype(np.float32)
    mat_ids = np.zeros((BH, BW), np.int8)

    cv = coeff_img.reshape(3, BH, 8, BW, 8)
    slot_lut = np.full(64, -1, np.int64)
    for s_, slot_ in _FAMILY8_SLOT.items():
        slot_lut[s_] = slot_

    fam_by_slot: dict = {}
    big_by_key: dict = {}
    for g in range(fd.num_groups):
        brect = fd.block_group_rect(g)
        blocks = group_blocks[g]
        if blocks is None:
            continue
        gy0, gx0 = brect.y0, brect.x0
        if isinstance(blocks, tuple) and blocks[0] == "flat":
            # Flat native-decoder output: vectorized scatter of the
            # 8x8-family blocks straight from the coefficient buffer.
            _, flat, prep = blocks
            strat = prep["strat"]
            offs = prep["blk_coeff_off"]
            slots = slot_lut[strat]
            fam = slots >= 0
            if fam.any():
                bys = prep["blk_by"][fam].astype(np.int64) + gy0
                bxs = prep["blk_bx"][fam].astype(np.int64) + gx0
                gather = offs[fam][:, None] + np.arange(192)
                cf = flat[gather].reshape(-1, 3, 8, 8)
                cv[:, bys, :, bxs, :] = cf
                mat_ids[bys, bxs] = slots[fam]
            for i in np.nonzero(~fam)[0]:
                s = int(strat[i])
                size = 3 * acs.COVERED_X[s] * acs.COVERED_Y[s] * 64
                off = int(offs[i])
                big_by_key.setdefault(s, ([], []))
                big_by_key[s][0].append(
                    (gy0 + int(prep["blk_by"][i]),
                     gx0 + int(prep["blk_bx"][i])))
                big_by_key[s][1].append(
                    flat[off:off + size].reshape(3, size // 3))
            continue
        for blk in blocks:
            s = int(blk.strategy)
            slot = _FAMILY8_SLOT.get(s)
            tgt = fam_by_slot if slot is not None else big_by_key
            key = slot if slot is not None else s
            tgt.setdefault(key, ([], []))
            tgt[key][0].append((gy0 + blk.by, gx0 + blk.bx))
            tgt[key][1].append(blk.coeffs)
    for slot, (anchors, coeffs) in fam_by_slot.items():
        ab = np.asarray(anchors, np.int64)
        bys, bxs = ab[:, 0], ab[:, 1]
        cf = np.stack(coeffs)
        cv[:, bys, :, bxs, :] = cf.reshape(-1, 3, 8, 8)
        mat_ids[bys, bxs] = slot

    classes = {}
    for s, (anchors, coeffs) in sorted(big_by_key.items()):
        cx, cy = acs.covered_blocks(s)
        ab = np.asarray(anchors, np.int64)
        bys, bxs = ab[:, 0], ab[:, 1]
        n = len(bys)
        cf = np.stack(coeffs)
        for i in range(n):
            by, bx = int(bys[i]), int(bxs[i])
            coeff_img[:, by * 8:(by + cy) * 8, bx * 8:(bx + cx) * 8] = \
                cf[i].reshape(3, cy * 8, cx * 8)
            fx[by:by + cy, bx:bx + cx] = fx[by, bx]
            fb[by:by + cy, bx:bx + cx] = fb[by, bx]
        cap = _pow2_pad(n)
        anchor_idx = np.zeros(cap, np.int32)
        anchor_idx[:n] = (bys * BW + bxs).astype(np.int32)
        mask = np.zeros(cap, np.float32)
        mask[:n] = 1.0
        key = (cy, cx)
        if key in classes:
            a0, m0 = classes[key]
            anchor_idx = np.concatenate([a0[m0 > 0], anchor_idx])
            mask = np.concatenate([m0[m0 > 0], mask])
        classes[key] = (anchor_idx, mask)

    # Table banks in this frame's dequant matrices (small constants).
    tables8 = np.stack([
        quantizer.dequant.table(st).reshape(3, 64) for st in FAMILY8
    ]).astype(np.float32)
    big_tables = {
        key: quantizer.dequant.table(
            next(s for s in big_by_key
                 if acs.covered_blocks(s) == (key[1], key[0]))
        ).reshape(3, key[0] * key[1] * 64).astype(np.float32)
        for key in classes
    }

    if np.abs(coeff_img).max(initial=0) < 32768:
        coeff_img = coeff_img.astype(np.int16)
    return dict(
        v2=True,
        coeff_img=coeff_img,
        mat_ids=mat_ids,
        raw_quant=raw_quant.astype(np.int32),
        dc=dc_full.astype(np.float32),
        fx=fx, fb=fb,
        inv_gs=np.float32(quantizer.inv_global_scale),
        qmul=np.array([x_mul, 1.0, b_mul], np.float32),
        tables8=tables8,
        big_tables=big_tables,
        classes=classes,
        biases=np.asarray(biases, np.float32),
    )


def dense_coeff(feed: dict) -> np.ndarray:
    """Dense coefficient image of a v2 feed. When the parse ran in
    sparse-sink-only mode the dense image was never written (it is all
    zeros); materialize it from the (idx, value) sink by scatter-add
    (progressive passes contribute multiple entries per position)."""
    ci = np.asarray(feed["coeff_img"])
    nz = feed.get("coeff_nz")
    if nz is None:
        return ci
    dense = np.zeros(ci.shape, ci.dtype)
    np.add.at(dense.reshape(-1), nz[0], nz[1])
    return dense


def build_feed3(coeff_img, mat_ids, fd, strategies, raw_quant, dc_full,
                quantizer, cmap, ytox_map, ytob_map, x_mul, b_mul,
                biases) -> dict:
    """Assemble the slim (v2) device feed around a coefficient image the
    native decoder already filled in place (vardct_decode_ac_frame) —
    only the small control maps are computed here, all vectorized."""
    from libjxl_tpu.vardct.group_native import family8_slot_lut

    BH, BW = fd.ysize_blocks, fd.xsize_blocks

    ty = np.arange(BH) // 8
    tx = np.arange(BW) // 8
    fx = (cmap.base_correlation_x
          + ytox_map[ty[:, None], tx[None, :]] * cmap.color_scale
          ).astype(np.float32)
    fb = (cmap.base_correlation_b
          + ytob_map[ty[:, None], tx[None, :]] * cmap.color_scale
          ).astype(np.float32)

    slot_lut = family8_slot_lut()
    classes = {}
    big_tables = {}
    class_masks = {}
    anchor_mask = strategies >= 0
    svals = np.unique(strategies[anchor_mask]) if anchor_mask.any() else []
    for s in svals:
        s = int(s)
        if slot_lut[s] >= 0:
            continue
        cx, cy = acs.covered_blocks(s)
        bys, bxs = np.nonzero(strategies == s)
        n = len(bys)
        # Spread the anchor's CfL factor across the covered blocks
        # (vectorized fancy-index scatter; covered areas don't overlap).
        ay = (bys[:, None, None] + np.arange(cy)[None, :, None])
        ax = (bxs[:, None, None] + np.arange(cx)[None, None, :])
        fx[ay, ax] = fx[bys, bxs][:, None, None]
        fb[ay, ax] = fb[bys, bxs][:, None, None]
        cap = _pow2_pad(n)
        anchor_idx = np.zeros(cap, np.int32)
        anchor_idx[:n] = (bys * BW + bxs).astype(np.int32)
        mask = np.zeros(cap, np.float32)
        mask[:n] = 1.0
        key = (cy, cx)
        if key in classes:
            a0, m0 = classes[key]
            anchor_idx = np.concatenate([a0[m0 > 0], anchor_idx])
            mask = np.concatenate([m0[m0 > 0], mask])
        classes[key] = (anchor_idx, mask)
        big_tables[key] = quantizer.dequant.table(s).reshape(
            3, cy * cx * 64).astype(np.float32)
        # Dense aligned-tile mask: when every anchor sits at a multiple
        # of its covered size (true for libjxl and this encoder — the
        # ACS merge works on aligned quads), the device IDCTs ALL
        # (cy, cx)-tiles densely and blends by this mask, avoiding the
        # arbitrary gather/scatter that dominates big frames on TPU.
        if class_masks is not None \
                and (bys % cy == 0).all() and (bxs % cx == 0).all():
            tbh = -(-BH // cy)
            tbw = -(-BW // cx)
            m = class_masks.get(key)
            if m is None:
                m = np.zeros((tbh, tbw), np.bool_)
            m[bys // cy, bxs // cx] = True
            class_masks[key] = m
        else:
            class_masks = None  # misaligned anchor: gather path only

    tables8 = getattr(quantizer.dequant, "_tables8_stack", None)
    if tables8 is None:
        tables8 = np.stack([
            quantizer.dequant.table(st).reshape(3, 64) for st in FAMILY8
        ]).astype(np.float32)
        quantizer.dequant._tables8_stack = tables8

    return dict(
        v2=True,
        coeff_img=coeff_img,
        mat_ids=mat_ids,
        raw_quant=raw_quant.astype(np.int32),
        dc=dc_full.astype(np.float32),
        fx=fx, fb=fb,
        inv_gs=np.float32(quantizer.inv_global_scale),
        qmul=np.array([x_mul, 1.0, b_mul], np.float32),
        tables8=tables8,
        big_tables=big_tables,
        classes=classes,
        class_masks=class_masks if class_masks else None,
        biases=np.asarray(biases, np.float32),
    )
