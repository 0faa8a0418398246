"""The jitted TPU decode pipeline: coefficients -> sRGB8.

One XLA program per (frame-shape, strategy-class-set, filter-config):
  1. AdjustQuantBias + dequant (VPU, elementwise over the whole frame)
  2. CfL (elementwise, per-block factors expanded to cells)
  3. LLF/DC insertion (elementwise add; weights are zero at LLF slots)
  4. IDCT:
     - the 8x8 family (DCT8/IDENTITY/DCT2x2/DCT4x4/DCT4X8/DCT8X4/AFV*)
       as masked matmuls against a bank of 64x64 matrices (MXU)
     - big/rect DCTs per class: gather -> separable IDCT (MXU) -> scatter
  5. gaborish + EPF (ops/filters_tpu.py)
  6. XYB -> linear -> sRGB8 (fused elementwise)

Mirrors lib/jxl/dec_group.cc + the render pipeline, re-shaped for the
MXU/VPU instead of per-row SIMD streaming.
"""

from __future__ import annotations

import functools

import numpy as np

from libjxl_tpu.tpu.feed import FAMILY8, big_idct_matrices, family8_matrices


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _family8_select_matmul(cells, ids, mat_bank, precision):
    """(3, N, 64) cells, (N,) strategy ids -> (3, N, 64) pixel cells.

    lax.scan over the bank: step s computes (cells * [ids==s]) @ M_s and
    accumulates. Exactly one step has a nonzero mask per block, and the
    masked matmuls contribute exact zeros, so the accumulation equals a
    per-block matrix select bit-for-bit.
    """
    jax, jnp = _jax()
    S = mat_bank.shape[0]

    def body(acc, sm):
        s, mat = sm
        mask = (ids == s).astype(jnp.float32)[None, :, None]
        return acc + jnp.matmul(cells * mask, mat,
                                precision=precision), None

    acc0 = jnp.zeros(cells.shape, jnp.float32)
    acc, _ = jax.lax.scan(body, acc0,
                          (jnp.arange(S, dtype=ids.dtype), mat_bank))
    return acc


def decode_xyb(coeff_img, weight_img, llf_img, fx, fb, mat_bank, mat_ids,
               big, biases):
    """Jit-traceable core: frame tensors -> (3, H, W) float32 XYB.

    ``big``: dict {(cy, cx): (in_idx, out_idx, mask)} — static structure,
    traced index tensors.
    """
    jax, jnp = _jax()
    _, H, W = coeff_img.shape
    BH, BW = H // 8, W // 8

    # 1-3: bias, dequant, CfL, LLF.
    x = coeff_img.astype(jnp.float32)
    b = jnp.asarray(biases, jnp.float32)
    bias_c = b[:3].reshape(3, 1, 1)
    general = x - b[3] / jnp.where(x == 0, 1.0, x)
    biased = jnp.where(x == 0, 0.0,
                       jnp.where(x == 1, bias_c,
                                 jnp.where(x == -1, -bias_c, general)))
    dq = biased * weight_img
    fx_cell = jnp.repeat(jnp.repeat(fx, 8, 0), 8, 1)
    fb_cell = jnp.repeat(jnp.repeat(fb, 8, 0), 8, 1)
    dq = jnp.stack([dq[0] + fx_cell * dq[1],
                    dq[1],
                    dq[2] + fb_cell * dq[1]])
    dq = dq + llf_img

    # 4a: 8x8 family: scan over the matrix bank — each step masks the
    # cells to the blocks using that strategy and runs ONE (N,64)@(64,64)
    # matmul. Masked lanes contribute exact zeros, so the result is
    # bit-identical to a per-block select while never materializing the
    # (3, N, S*64) product (~1 GB at 4K, which OOMed the TPU compile
    # helper) and keeping the scan body a single small compiled graph.
    cells = dq.reshape(3, BH, 8, BW, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(3, BH * BW, 64)
    ids = mat_ids.reshape(BH * BW)
    # f32 MXU precision: TPU matmuls default to bf16, which is far too
    # coarse for IDCT (visible banding); force the 3-pass f32 algorithm.
    hi = jax.lax.Precision.HIGHEST
    pix_cells = _family8_select_matmul(cells, ids, mat_bank, hi)
    pix = pix_cells.reshape(3, BH, BW, 8, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(3, H, W)

    # 4b: big blocks — gather stored grids, separable IDCT, scatter.
    if big:
        flat_dq = dq.reshape(3, H * W)
        flat_pix = pix.reshape(3, H * W)
        for (cy, cx), (in_idx, out_idx, mask) in sorted(big.items()):
            grids = flat_dq[:, in_idx]            # (3, n, ly*8, lx*8)
            if cy >= cx:
                # Stored grids are transposed (wide); back to natural.
                grids = grids.transpose(0, 1, 3, 2)
            ih, iw = big_idct_matrices(cy, cx)
            blk = jnp.einsum("yu,cnuv,wv->cnyw", jnp.asarray(ih),
                             grids, jnp.asarray(iw),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
            # Masked scatter-ADD: capacity-padding entries contribute
            # zero, keeping duplicate indices deterministic.
            base = flat_pix[:, out_idx]
            delta = (blk - base) * mask[None, :, None, None]
            flat_pix = flat_pix.at[:, out_idx].add(delta)
        pix = flat_pix.reshape(3, H, W)
    return pix


def _srgb8(xyb):
    from libjxl_tpu.ops.decode_tpu import xyb_to_srgb8
    return xyb_to_srgb8(xyb)


def make_decode_fn(big_keys: tuple, epf_iters: int, gab: bool,
                   image_h: int, image_w: int):
    """Builds the jitted frame decoder for a given static config."""
    jax, jnp = _jax()
    from libjxl_tpu.ops.epf_pallas import \
        apply_loop_filters_auto as apply_loop_filters_tpu

    @jax.jit
    def run(coeff_img, weight_img, llf_img, fx, fb, mat_bank, mat_ids,
            biases, inv_sigma_blocks, *big_flat):
        big = {}
        for i, key in enumerate(big_keys):
            big[key] = (big_flat[3 * i], big_flat[3 * i + 1],
                        big_flat[3 * i + 2])
        xyb = decode_xyb(coeff_img, weight_img, llf_img, fx, fb,
                         mat_bank, mat_ids, big, biases)
        xyb = xyb[:, :image_h, :image_w]
        if gab or epf_iters > 0:
            xyb = apply_loop_filters_tpu(
                xyb, inv_sigma_blocks, epf_iters=epf_iters, gab=gab)
        return _srgb8(xyb)

    return run


_FN_CACHE: dict = {}


def decode_frame_device(feed: dict, lf, quantizer, raw_quant, sharpness,
                        image_h: int, image_w: int,
                        return_xyb: bool = False,
                        inv_sigma=None, as_numpy: bool = True):
    """Run the device pipeline on a host-built feed; returns sRGB8
    (H, W, 3) uint8 (or float32 XYB when return_xyb)."""
    jax, jnp = _jax()
    from libjxl_tpu.pipeline.loop_filters import compute_sigma_map

    big_keys = tuple(sorted(feed["big"].keys()))
    # Pad the per-class capacity into the cache key so repeated frames
    # with similar content reuse the compiled program.
    caps = tuple(feed["big"][k][0].shape[0] for k in big_keys)
    gab = bool(lf.gab)
    epf_iters = int(lf.epf_iters)
    mi_key = np.maximum(np.asarray(feed["mat_ids"]), 0)
    key = (big_keys, caps, epf_iters, gab, feed["coeff_img"].shape,
           image_h, image_w, return_xyb,
           tuple(int(s) for s in np.unique(mi_key)))
    if key not in _FN_CACHE:
        if return_xyb:
            from libjxl_tpu.ops.epf_pallas import \
        apply_loop_filters_auto as apply_loop_filters_tpu

            def make_xyb():
                @jax.jit
                def run(coeff_img, weight_img, llf_img, fx, fb, mat_bank,
                        mat_ids, biases, inv_sigma_blocks, *big_flat):
                    big = {}
                    for i, k in enumerate(big_keys):
                        big[k] = (big_flat[3 * i], big_flat[3 * i + 1],
                                  big_flat[3 * i + 2])
                    xyb = decode_xyb(coeff_img, weight_img, llf_img, fx,
                                     fb, mat_bank, mat_ids, big, biases)
                    xyb = xyb[:, :image_h, :image_w]
                    if gab or epf_iters > 0:
                        xyb = apply_loop_filters_tpu(
                            xyb, inv_sigma_blocks, epf_iters=epf_iters,
                            gab=gab)
                    return xyb
                return run
            _FN_CACHE[key] = make_xyb()
        else:
            _FN_CACHE[key] = make_decode_fn(big_keys, epf_iters, gab,
                                            image_h, image_w)
    fn = _FN_CACHE[key]

    if inv_sigma is None:
        if gab or epf_iters > 0:
            inv_sigma = compute_sigma_map(lf, raw_quant, sharpness,
                                          quantizer.global_scale_float)
        else:
            inv_sigma = np.zeros_like(raw_quant, dtype=np.float32)

    big_flat = []
    for k in big_keys:
        big_flat.extend(feed["big"][k])
    # Prune the family8 bank to used slots (see decode_frame_device2).
    mi = np.maximum(np.asarray(feed["mat_ids"]), 0)
    used = [int(s) for s in np.unique(mi)]
    lut = np.zeros(max(used) + 1, mi.dtype)
    for i, s in enumerate(used):
        lut[s] = i
    args = [feed["coeff_img"], feed["weight_img"], feed["llf_img"],
            feed["fx"], feed["fb"], family8_matrices()[used], lut[mi],
            feed["biases"], inv_sigma.astype(np.float32)] + big_flat
    # One batched host->device transfer (per-argument commits pay a
    # full round-trip each over remote/tunneled device links).
    args = jax.device_put(args)
    out = fn(*args)
    return np.asarray(out) if as_numpy else out


# ---------------------------------------------------------------------------
# v2: slim-feed pipeline — dequant weights and LLF computed on device.

def _class_constants(cy, cx):
    """Static per-class constants for the device LLF/IDCT."""
    from libjxl_tpu.vardct import ac_strategy as acs
    from libjxl_tpu.vardct.dct import dct_matrix, resample_scales
    ly, lx = acs.coefficient_layout(cy, cx)
    mcy = dct_matrix(cy).astype(np.float32) if cy > 1 else np.ones((1, 1),
                                                                   np.float32)
    mcx = dct_matrix(cx).astype(np.float32) if cx > 1 else np.ones((1, 1),
                                                                   np.float32)
    sy = resample_scales(cy, cy * 8).astype(np.float32)
    sx = resample_scales(cx, cx * 8).astype(np.float32)
    return ly, lx, mcy, mcx, sy, sx


def decode_xyb2(coeff_img, mat_ids, raw_quant, dc, fx, fb, inv_gs, qmul,
                tables8, mat_bank, big_tables, classes, biases, BW_blocks,
                class_masks=None):
    """Slim-feed core: coefficients + control maps -> (3, H, W) XYB.

    ``classes``: {(cy, cx): (anchor_idx, mask)}; ``big_tables``:
    {(cy, cx): (3, size) table}. Weights/LLF are reconstructed here so
    the host ships ~6 bytes/pixel.

    ``class_masks``: optional {(cy, cx): (TBH, TBW) bool} dense
    anchor-tile masks. When given (anchors aligned to their covered
    size), each big class is decoded by IDCT-ing EVERY aligned tile of
    the frame and blending by mask — pure dense reshapes/matmuls, no
    gather/scatter (which costs ~0.5 s/4K-frame on TPU vs ~10 ms for
    the dense form).
    """
    jax, jnp = _jax()
    _, H, W = coeff_img.shape
    BH, BW = H // 8, W // 8
    hi = jax.lax.Precision.HIGHEST

    b = jnp.asarray(biases, jnp.float32)

    def adjust(q):
        x = q.astype(jnp.float32)
        nd = x.ndim
        bias_c = b[:3].reshape((3,) + (1,) * (nd - 1))
        general = x - b[3] / jnp.where(x == 0, 1.0, x)
        return jnp.where(x == 0, 0.0,
                         jnp.where(x == 1, bias_c,
                                   jnp.where(x == -1, -bias_c, general)))

    # ---- 8x8-family cells ----
    N = BH * BW
    cells = coeff_img.reshape(3, BH, 8, BW, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(3, N, 64)
    ids = mat_ids.reshape(N).astype(jnp.int32)
    biased = adjust(cells)
    w_cells = tables8[ids].transpose(1, 0, 2)          # (3, N, 64)
    scale = (inv_gs / raw_quant.reshape(N).astype(jnp.float32))
    dqc = biased * w_cells * scale[None, :, None] * qmul[:, None, None]
    fxf = fx.reshape(N)
    fbf = fb.reshape(N)
    dqc = jnp.stack([dqc[0] + fxf[:, None] * dqc[1],
                     dqc[1],
                     dqc[2] + fbf[:, None] * dqc[1]])
    dqc = dqc.at[..., 0].set(dc.reshape(3, N))
    # Scanned masked-matmul bank select (see _family8_select_matmul).
    pix_cells = _family8_select_matmul(dqc, ids, mat_bank, hi)
    pix = pix_cells.reshape(3, BH, BW, 8, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(3, H, W)

    # ---- big/rect classes: dense aligned-tile path ----
    if class_masks is not None:
        rq_f = raw_quant.astype(jnp.float32)
        for (cy, cx), m in sorted(class_masks.items()):
            ly, lx, mcy, mcx, sy, sx = _class_constants(cy, cx)
            table = big_tables[(cy, cx)]               # (3, size)
            TBH, TBW = -(-BH // cy), -(-BW // cx)
            PH, PW = TBH * cy * 8, TBW * cx * 8
            ci = coeff_img if (PH == H and PW == W) else jnp.pad(
                coeff_img, ((0, 0), (0, PH - H), (0, PW - W)))
            tiles = ci.reshape(3, TBH, cy * 8, TBW, cx * 8) \
                .transpose(0, 1, 3, 2, 4)
            grids = adjust(tiles.reshape(3, TBH, TBW, ly * 8, lx * 8))
            # Anchor-block scale / CfL factors via strided slices.
            def _anchor(a):
                ap = a if (TBH * cy == BH and TBW * cx == BW) else jnp.pad(
                    a, ((0, TBH * cy - BH), (0, TBW * cx - BW)),
                    constant_values=1)
                return ap[0::cy, 0::cx]                # (TBH, TBW)
            scale_e = inv_gs / _anchor(rq_f)
            dqg = grids * table.reshape(3, 1, 1, ly * 8, lx * 8) \
                * scale_e[None, :, :, None, None] \
                * qmul[:, None, None, None, None]
            fxe = _anchor(fx)[:, :, None, None]
            fbe = _anchor(fb)[:, :, None, None]
            dqg = jnp.stack([dqg[0] + fxe * dqg[1],
                             dqg[1],
                             dqg[2] + fbe * dqg[1]])
            # LLF from the DC image (LowestFrequenciesFromDC), dense.
            dcp = dc if (TBH * cy == BH and TBW * cx == BW) else jnp.pad(
                dc, ((0, 0), (0, TBH * cy - BH), (0, TBW * cx - BW)))
            dcs = dcp.reshape(3, TBH, cy, TBW, cx).transpose(0, 1, 3, 2, 4)
            llf = jnp.einsum("ui,cabij,vj->cabuv", jnp.asarray(mcy), dcs,
                             jnp.asarray(mcx), precision=hi,
                             preferred_element_type=jnp.float32)
            llf = llf * sy[None, None, None, :, None] \
                * sx[None, None, None, None, :]
            if cy >= cx:
                llf = llf.transpose(0, 1, 2, 4, 3)
            dqg = dqg.at[:, :, :, :ly, :lx].set(llf)
            if cy >= cx:
                dqg = dqg.transpose(0, 1, 2, 4, 3)
            ih, iw = big_idct_matrices(cy, cx)
            blk = jnp.einsum("yu,cabuv,wv->cabyw", jnp.asarray(ih), dqg,
                             jnp.asarray(iw), precision=hi,
                             preferred_element_type=jnp.float32)
            pixp = pix if (PH == H and PW == W) else jnp.pad(
                pix, ((0, 0), (0, PH - H), (0, PW - W)))
            ptiles = pixp.reshape(3, TBH, cy * 8, TBW, cx * 8) \
                .transpose(0, 1, 3, 2, 4)
            sel = m[None, :, :, None, None]
            merged = jnp.where(sel, blk, ptiles)
            pix = merged.transpose(0, 1, 3, 2, 4) \
                .reshape(3, PH, PW)[:, :H, :W]
        return pix

    # ---- big/rect classes: gather/scatter fallback (anchors not
    # aligned to the covered size — legal but not encoder-produced) ----
    if classes:
        flat_coeff = coeff_img.reshape(3, H * W)
        flat_pix = pix.reshape(3, H * W)
        dc_flat = dc.reshape(3, N)
        rq_flat = raw_quant.reshape(N).astype(jnp.float32)
        fx_flat = fx.reshape(N)
        fb_flat = fb.reshape(N)
        for (cy, cx), (anchor_idx, mask) in sorted(classes.items()):
            ly, lx, mcy, mcx, sy, sx = _class_constants(cy, cx)
            table = big_tables[(cy, cx)]               # (3, size)
            aby = anchor_idx // BW_blocks
            abx = anchor_idx % BW_blocks
            base = aby * 8 * W + abx * 8
            cov_lin = (np.arange(cy * 8)[:, None] * W
                       + np.arange(cx * 8)[None, :]).ravel()
            in_grid = jnp.asarray(cov_lin.reshape(ly * 8, lx * 8))
            out_grid = jnp.asarray(cov_lin.reshape(cy * 8, cx * 8))
            in_idx = base[:, None, None] + in_grid[None]
            out_idx = base[:, None, None] + out_grid[None]
            grids = adjust(flat_coeff[:, in_idx])      # (3, cap, ly8, lx8)
            scale_e = inv_gs / rq_flat[anchor_idx]     # (cap,)
            tbl = table.reshape(3, 1, ly * 8, lx * 8)
            dqg = grids * tbl * scale_e[None, :, None, None] \
                * qmul[:, None, None, None]
            fxe = fx_flat[anchor_idx]
            fbe = fb_flat[anchor_idx]
            dqg = jnp.stack([dqg[0] + fxe[:, None, None] * dqg[1],
                             dqg[1],
                             dqg[2] + fbe[:, None, None] * dqg[1]])
            # LLF from the DC image (device-side LowestFrequenciesFromDC)
            dci = (anchor_idx[:, None, None]
                   + (np.arange(cy)[:, None] * BW_blocks
                      + np.arange(cx)[None, :])[None])  # (cap, cy, cx)
            dcs = dc_flat[:, dci]                       # (3, cap, cy, cx)
            llf = jnp.einsum("ui,cnij,vj->cnuv", jnp.asarray(mcy), dcs,
                             jnp.asarray(mcx), precision=hi,
                             preferred_element_type=jnp.float32)
            llf = llf * sy[None, None, :, None] * sx[None, None, None, :]
            if cy >= cx:
                llf = llf.transpose(0, 1, 3, 2)
            dqg = dqg.at[:, :, :ly, :lx].set(llf)
            if cy >= cx:
                dqg = dqg.transpose(0, 1, 3, 2)
            ih, iw = big_idct_matrices(cy, cx)
            blk = jnp.einsum("yu,cnuv,wv->cnyw", jnp.asarray(ih), dqg,
                             jnp.asarray(iw), precision=hi,
                             preferred_element_type=jnp.float32)
            base_pix = flat_pix[:, out_idx]
            delta = (blk - base_pix) * mask[None, :, None, None]
            flat_pix = flat_pix.at[:, out_idx].add(delta)
        pix = flat_pix.reshape(3, H, W)
    return pix


_FN2_CACHE: dict = {}

# Device-resident pruned matrix banks, keyed by used-slot tuple. The
# bank is identical for every frame using the same slots, and a
# device_put over the tunneled link costs ~50 ms of fixed latency —
# re-shipping 16-96 KB of constants per frame doubled the per-frame
# transfer count for nothing.
_BANK_CACHE: dict = {}


def _device_bank(used_slots: tuple):
    jax, _ = _jax()
    bank = _BANK_CACHE.get(used_slots)
    if bank is None:
        bank = jax.device_put(family8_matrices()[list(used_slots)])
        _BANK_CACHE[used_slots] = bank
    return bank

# Granularity of the sparse-coefficient capacity padding: coarse enough
# to keep the number of distinct compiled programs small, fine enough
# not to waste link bandwidth (pow2 padding wasted up to ~50%).
_NZ_CAP_STEP = 1 << 18


def _use_packed() -> bool:
    """Packed single-buffer feed transfer (default on). JXL_TPU_PACKED=0
    falls back to per-array device_put in case a backend mishandles
    slice+bitcast unpacking."""
    import os
    return os.environ.get("JXL_TPU_PACKED", "1") != "0"


def _pack_layout(specs):
    """[(name, dtype, shape)] -> (total_bytes, {name: (off, dtype,
    shape)}); every section 4-byte aligned."""
    off = 0
    layout = {}
    for name, dtype, shape in specs:
        dt = np.dtype(dtype)
        n = int(np.prod(shape)) if shape else 1
        layout[name] = (off, dt, tuple(shape))
        off += -(-(n * dt.itemsize) // 4) * 4
    return off, layout


def _pack_host(buf, layout, name, arr):
    off, dt, shape = layout[name]
    a = np.ascontiguousarray(arr, dtype=dt)
    raw = a.view(np.uint8).ravel()
    buf[off:off + raw.size] = raw


def _unpack_dev(buf, layout, name):
    """Static slice + bitcast of one section inside jit."""
    jax, jnp = _jax()
    off, dt, shape = layout[name]
    n = int(np.prod(shape)) if shape else 1
    raw = jax.lax.slice(buf, (off,), (off + n * dt.itemsize,))
    if dt.itemsize == 1:
        out = raw.astype(jnp.int8) if dt == np.int8 else raw
    else:
        out = jax.lax.bitcast_convert_type(
            raw.reshape(n, dt.itemsize), jnp.dtype(dt.str))
    return out.reshape(shape) if shape else out.reshape(())


_NOISE_DEV_CACHE: dict = {}


def _device_noise_planes(h, w, gd, vfi):
    """Device-resident raw noise planes, cached per shape (they are
    content-independent; see ops/stages_tpu.py)."""
    import jax
    from libjxl_tpu.ops.stages_tpu import noise_planes_for
    key = (h, w, gd, vfi)
    if key not in _NOISE_DEV_CACHE:
        _NOISE_DEV_CACHE[key] = jax.device_put(
            noise_planes_for(h, w, gd, vfi))
    return _NOISE_DEV_CACHE[key]


def decode_frame_device2(feed: dict, image_h: int, image_w: int,
                         return_xyb: bool = False, as_numpy: bool = True,
                         out: str = "srgb8", post: dict | None = None):
    """Run the slim-feed (v2) device pipeline.

    The whole per-frame feed travels as ONE packed uint8 buffer
    (sparse coefficients + control maps), unpacked by static
    slice+bitcast inside the jitted program: the tunneled host->device
    link serializes with compute, so per-frame transfer cost is
    bytes/bandwidth + a single enqueue, not ~20 array round-trips
    (SURVEY.md §5.8 — the host->device staging IS the communication
    backend to engineer).

    out: final device stage — "srgb8" (uint8), "pq16" (uint16 PQ-encoded
    BT.2100 HDR output, stage_from_linear TF_PQ analogue) or "xyb"
    (float32 planes)."""
    jax, jnp = _jax()
    from libjxl_tpu.ops.epf_pallas import \
        apply_loop_filters_auto as apply_loop_filters_tpu

    lf = feed["lf"]
    if return_xyb:
        out = "xyb"
    gab = bool(lf.gab)
    epf_iters = int(lf.epf_iters)
    class_keys = tuple(sorted(feed["classes"].keys()))
    caps = tuple(feed["classes"][k][0].shape[0] for k in class_keys)
    masks = feed.get("class_masks")
    dense = masks is not None and set(masks) == set(class_keys)
    BW_blocks = feed["mat_ids"].shape[1]
    BH_blocks = feed["mat_ids"].shape[0]
    cshape = feed["coeff_img"].shape
    # Sparse transfer: ship (idx, value) of the nonzero coefficients and
    # scatter-add on device instead of the dense int16 image (~6 B per
    # nonzero vs 6 B/pixel; the host->device link is the 4K bottleneck).
    nz = feed.get("coeff_nz")
    sparse = nz is not None
    nz_cap = 0
    if sparse:
        n_nz = nz[0].size
        nz_cap = max(1 << 16, -(-n_nz // _NZ_CAP_STEP) * _NZ_CAP_STEP)

    # Prune the 8x8-family matrix bank to the slots this frame USES:
    # the masked scan otherwise runs one full-frame (N,64)@(64,64)
    # HIGHEST matmul per bank slot (~10x redundant MXU work on typical
    # frames that carry only DCT8X8; VERDICT r3 weak #3). mat_ids are
    # remapped host-side to indices into the pruned bank.
    mi_orig = np.maximum(np.asarray(feed["mat_ids"]), 0)
    used_slots = tuple(int(s) for s in np.unique(mi_orig))
    slot_lut = np.zeros(int(max(used_slots)) + 1, np.int8)
    for i, s in enumerate(used_slots):
        slot_lut[s] = i
    mat_ids_pruned = slot_lut[mi_orig]
    tables8_pruned = np.ascontiguousarray(
        np.asarray(feed["tables8"])[list(used_slots)])

    # Post-stages (dec_cache.cc order: EPF -> upsampling -> noise).
    post = post or {}
    up_n = int(post.get("upsample", 1))
    up_kernels = post.get("up_kernels")
    noise_cfg = post.get("noise")       # (lut, ytox, ytob, gd, vfi)
    spline_args = post.get("splines")   # (cy, cx, sig, inten, col)
    spline_cap = spline_args[0].shape[0] if spline_args else 0
    patch_ka = post.get("patch_affine")  # (K, A) float32 (3, H, W)
    if up_n > 1 and up_kernels is None:
        from libjxl_tpu.pipeline.upsample import _kernels
        up_kernels = _kernels(up_n).astype(np.float32)
    final_h, final_w = post.get("final_hw",
                                (image_h * up_n, image_w * up_n))

    specs = []
    if sparse:
        specs += [("nzi", np.int32, (nz_cap,)),
                  ("nzv", np.int16, (nz_cap,))]
    else:
        specs += [("coeff", feed["coeff_img"].dtype, cshape)]
    specs += [
        ("mat_ids", np.int8, (BH_blocks, BW_blocks)),
        ("raw_quant", np.int16, (BH_blocks, BW_blocks)),
        ("dc", np.float32, (3, BH_blocks, BW_blocks)),
        ("fx", np.float32, (BH_blocks, BW_blocks)),
        ("fb", np.float32, (BH_blocks, BW_blocks)),
        ("inv_sigma", np.float32, (BH_blocks, BW_blocks)),
        ("tables8", np.float32, tables8_pruned.shape),
        ("biases", np.float32, (4,)),
        ("scalars", np.float32, (4,)),     # inv_gs, qmul[3]
    ]
    for k in class_keys:
        specs.append((f"tbl{k}", np.float32, feed["big_tables"][k].shape))
        if dense:
            specs.append((f"mask{k}", np.uint8, masks[k].shape))
        else:
            a, m = feed["classes"][k]
            specs.append((f"anchor{k}", np.int32, a.shape))
            specs.append((f"amask{k}", np.float32, m.shape))
    total, layout = _pack_layout(specs)

    packed = _use_packed()
    key = (class_keys, caps, epf_iters, gab, cshape,
           feed["coeff_img"].dtype.str, image_h, image_w, out,
           BW_blocks, dense, sparse, nz_cap, packed, up_n,
           final_h, final_w, noise_cfg is not None, spline_cap,
           patch_ka is not None, used_slots)

    def core_xyb(get, mat_bank):
        """Stage A: packed feed -> cropped XYB (scatter + dequant +
        CfL + IDCT)."""
        if sparse:
            coeff_img = jnp.zeros(
                cshape[0] * cshape[1] * cshape[2], jnp.int16
            ).at[get("nzi")].add(get("nzv")).reshape(cshape)
        else:
            coeff_img = get("coeff")
        sc = get("scalars")
        inv_gs, qmul = sc[0], sc[1:4]
        raw_quant = get("raw_quant").astype(jnp.int32)
        big_tables = {k: get(f"tbl{k}") for k in class_keys}
        if dense:
            cmasks = {k: get(f"mask{k}").astype(jnp.bool_)
                      for k in class_keys}
            classes = None
        else:
            cmasks = None
            classes = {k: (get(f"anchor{k}"), get(f"amask{k}"))
                       for k in class_keys}
        xyb = decode_xyb2(coeff_img, get("mat_ids"), raw_quant,
                          get("dc"), get("fx"), get("fb"),
                          inv_gs, qmul, get("tables8"), mat_bank,
                          big_tables, classes, get("biases"),
                          BW_blocks, class_masks=cmasks)
        return xyb[:, :image_h, :image_w]

    def core_post(xyb, get, noise_raw=None, splines_dev=None,
                  patch_ka_dev=None):
        """Stage B: XYB -> filters + post stages + output encoding."""
        if gab or epf_iters > 0:
            xyb = apply_loop_filters_tpu(xyb, get("inv_sigma"),
                                         epf_iters=epf_iters, gab=gab)
        if up_n > 1:
            from libjxl_tpu.ops.stages_tpu import upsample_image_tpu
            xyb = upsample_image_tpu(xyb, up_n, up_kernels)
            xyb = xyb[:, :final_h, :final_w]
        if patch_ka_dev is not None:
            xyb = xyb * patch_ka_dev[0] + patch_ka_dev[1]
        if splines_dev is not None:
            from libjxl_tpu.ops.stages_tpu import render_splines_tpu
            xyb = render_splines_tpu(xyb, *splines_dev)
        if noise_cfg is not None:
            from libjxl_tpu.ops.stages_tpu import add_noise_tpu
            lut_, ytox_, ytob_, gd_, vfi_ = noise_cfg
            xyb = add_noise_tpu(xyb, noise_raw,
                                jnp.asarray(lut_, jnp.float32),
                                float(ytox_), float(ytob_))
        if out == "xyb":
            return xyb
        if out == "pq16":
            from libjxl_tpu.ops.decode_tpu import xyb_to_pq16
            return xyb_to_pq16(xyb)
        return _srgb8(xyb)

    names = [s[0] for s in specs]
    if key not in _FN2_CACHE:
        if packed:
            # TWO programs split at the XYB boundary: XLA's global
            # fusion search over the fully fused frame program goes
            # superlinear at 4K (>25 min single-core compile for the
            # monolith; each half compiles in seconds), and the halves
            # chain as two async dispatches with no host sync between.
            @jax.jit
            def run_a(buf, mat_bank):
                return core_xyb(lambda n: _unpack_dev(buf, layout, n),
                                mat_bank)

            @jax.jit
            def run_b(xyb, buf, noise_raw=None, splines_dev=None,
                      patch_ka_dev=None):
                return core_post(xyb,
                                 lambda n: _unpack_dev(buf, layout, n),
                                 noise_raw, splines_dev, patch_ka_dev)
            _FN2_CACHE[key] = ("split", run_a, run_b)
        else:
            @jax.jit
            def run(mat_bank, noise_raw, splines_dev, patch_ka_dev,
                    *arrs):
                byname = dict(zip(names, arrs))
                x = core_xyb(byname.__getitem__, mat_bank)
                return core_post(x, byname.__getitem__, noise_raw,
                                 splines_dev, patch_ka_dev)
            _FN2_CACHE[key] = ("mono", run)
    fn = _FN2_CACHE[key]
    noise_dev = None
    if noise_cfg is not None:
        _, _, _, gd_, vfi_ = noise_cfg
        noise_dev = _device_noise_planes(final_h, final_w, gd_, vfi_)

    def host_value(name):
        if name == "nzi":
            a = np.zeros(nz_cap, np.int32)
            a[:nz[0].size] = nz[0]
            return a
        if name == "nzv":
            a = np.zeros(nz_cap, np.int16)
            a[:nz[1].size] = nz[1]
            return a
        if name == "coeff":
            return feed["coeff_img"]
        if name == "scalars":
            return np.concatenate(
                [[feed["inv_gs"]], feed["qmul"]]).astype(np.float32)
        if name.startswith("tbl"):
            return feed["big_tables"][eval(name[3:])]
        if name.startswith("mask"):
            return masks[eval(name[4:])]
        if name.startswith("anchor"):
            return feed["classes"][eval(name[6:])][0]
        if name.startswith("amask"):
            return feed["classes"][eval(name[5:])][1]
        if name == "mat_ids":
            return mat_ids_pruned
        if name == "tables8":
            return tables8_pruned
        return feed[name]

    if packed:
        buf = np.zeros(total, np.uint8)
        if sparse:
            n_nz = nz[0].size
            off, _, _ = layout["nzi"]
            buf[off:off + 4 * n_nz] = nz[0].view(np.uint8).ravel()
            off, _, _ = layout["nzv"]
            buf[off:off + 2 * n_nz] = nz[1].view(np.uint8).ravel()
            rest = names[2:]
        else:
            _pack_host(buf, layout, "coeff", feed["coeff_img"])
            rest = names[1:]
        for n in rest:
            _pack_host(buf, layout, n, host_value(n))
        dbuf = jax.device_put(buf)
        dbank = _device_bank(used_slots)
        _, run_a, run_b = fn
        x = run_a(dbuf, dbank)
        if (noise_dev is not None or spline_args is not None
                or patch_ka is not None):
            out = run_b(x, dbuf, noise_dev, spline_args, patch_ka)
        else:
            out = run_b(x, dbuf)
    else:
        arrs = [np.ascontiguousarray(host_value(n), dtype=layout[n][1])
                .reshape(layout[n][2]) for n in names]
        dargs = jax.device_put(arrs)
        out = fn[1](_device_bank(used_slots), noise_dev, spline_args,
                    patch_ka, *dargs)
    return np.asarray(out) if as_numpy else out


# ---------------------------------------------------------------------------
# Batched multi-frame decode: one packed buffer + ONE dispatch for N
# same-shape frames (vmap over the packed feed). Amortizes the
# tunneled link's per-dispatch serialization with compute — the
# multi-image throughput path of SURVEY.md §7 step 11.

_FNB_CACHE: dict = {}


def decode_frames_device_batched(feeds: list, image_h: int, image_w: int,
                                 as_numpy: bool = True,
                                 out: str = "srgb8"):
    """Decode N same-shape feeds in one jitted dispatch; returns the
    (N, ...) output batch. Frames may differ in strategies/content —
    per-class masks are zero-filled for frames lacking a class."""
    jax, jnp = _jax()
    from libjxl_tpu.ops.epf_pallas import \
        apply_loop_filters_auto as apply_loop_filters_tpu

    n = len(feeds)
    f0 = feeds[0]
    lf = f0["lf"]
    gab = bool(lf.gab)
    epf_iters = int(lf.epf_iters)
    cshape = f0["coeff_img"].shape
    BH_blocks, BW_blocks = f0["mat_ids"].shape
    def masks_of(f):
        # class_masks is None both for "no big classes at all" (fine —
        # treat as empty) and for misaligned anchors (gather-only path,
        # not batchable).
        m = f.get("class_masks")
        if m is None and f["classes"]:
            raise ValueError("batch requires dense-mask feeds")
        return m or {}

    for f in feeds:
        if (f["coeff_img"].shape != cshape
                or bool(f["lf"].gab) != gab
                or int(f["lf"].epf_iters) != epf_iters):
            raise ValueError("batch requires same-shape, same-filter "
                             "frames")
        if f.get("coeff_nz") is None:
            raise ValueError("batch requires sparse feeds")
        masks_of(f)

    class_keys = tuple(sorted({k for f in feeds
                               for k in masks_of(f)}))
    nnz_max = max(f["coeff_nz"][0].size for f in feeds)
    nz_cap = max(1 << 16, -(-nnz_max // _NZ_CAP_STEP) * _NZ_CAP_STEP)

    specs = [("nzi", np.int32, (nz_cap,)),
             ("nzv", np.int16, (nz_cap,)),
             ("mat_ids", np.int8, (BH_blocks, BW_blocks)),
             ("raw_quant", np.int16, (BH_blocks, BW_blocks)),
             ("dc", np.float32, (3, BH_blocks, BW_blocks)),
             ("fx", np.float32, (BH_blocks, BW_blocks)),
             ("fb", np.float32, (BH_blocks, BW_blocks)),
             ("inv_sigma", np.float32, (BH_blocks, BW_blocks)),
             ("tables8", np.float32, f0["tables8"].shape),
             ("biases", np.float32, (4,)),
             ("scalars", np.float32, (4,))]
    from libjxl_tpu.vardct import ac_strategy as acs_mod
    for k in class_keys:
        cy, cx = k
        tbl_shape = (3, cy * cx * 64)
        tbh, tbw = -(-BH_blocks // cy), -(-BW_blocks // cx)
        specs.append((f"tbl{k}", np.float32, tbl_shape))
        specs.append((f"mask{k}", np.uint8, (tbh, tbw)))
    total, layout = _pack_layout(specs)

    key = (n, class_keys, epf_iters, gab, cshape, image_h, image_w,
           out, nz_cap)
    if key not in _FNB_CACHE:
        # Split at the XYB boundary like decode_frame_device2: the
        # fully fused frame program's XLA compile goes superlinear at
        # 4K; the halves compile in seconds and chain asynchronously.
        def one_xyb(buf, mat_bank):
            get = lambda nm: _unpack_dev(buf, layout, nm)  # noqa: E731
            coeff_img = jnp.zeros(
                cshape[0] * cshape[1] * cshape[2], jnp.int16
            ).at[get("nzi")].add(get("nzv")).reshape(cshape)
            sc = get("scalars")
            big_tables = {k: get(f"tbl{k}") for k in class_keys}
            cmasks = {k: get(f"mask{k}").astype(jnp.bool_)
                      for k in class_keys}
            xyb = decode_xyb2(coeff_img, get("mat_ids"),
                              get("raw_quant").astype(jnp.int32),
                              get("dc"), get("fx"), get("fb"),
                              sc[0], sc[1:4], get("tables8"), mat_bank,
                              big_tables, None, get("biases"),
                              BW_blocks, class_masks=cmasks)
            return xyb[:, :image_h, :image_w]

        def one_post(xyb, buf):
            get = lambda nm: _unpack_dev(buf, layout, nm)  # noqa: E731
            if gab or epf_iters > 0:
                xyb = apply_loop_filters_tpu(xyb, get("inv_sigma"),
                                             epf_iters=epf_iters,
                                             gab=gab)
            if out == "xyb":
                return xyb
            if out == "pq16":
                from libjxl_tpu.ops.decode_tpu import xyb_to_pq16
                return xyb_to_pq16(xyb)
            return _srgb8(xyb)
        _FNB_CACHE[key] = (
            jax.jit(jax.vmap(one_xyb, in_axes=(0, None))),
            jax.jit(jax.vmap(one_post, in_axes=(0, 0))))
    fn = _FNB_CACHE[key]

    bufs = np.zeros((n, total), np.uint8)
    for i, f in enumerate(feeds):
        buf = bufs[i]
        nz = f["coeff_nz"]
        off, _, _ = layout["nzi"]
        buf[off:off + 4 * nz[0].size] = nz[0].view(np.uint8).ravel()
        off, _, _ = layout["nzv"]
        buf[off:off + 2 * nz[1].size] = nz[1].view(np.uint8).ravel()
        _pack_host(buf, layout, "mat_ids", f["mat_ids"])
        _pack_host(buf, layout, "raw_quant", f["raw_quant"])
        _pack_host(buf, layout, "dc", f["dc"])
        _pack_host(buf, layout, "fx", f["fx"])
        _pack_host(buf, layout, "fb", f["fb"])
        _pack_host(buf, layout, "inv_sigma", f["inv_sigma"])
        _pack_host(buf, layout, "tables8", f["tables8"])
        _pack_host(buf, layout, "biases", f["biases"])
        _pack_host(buf, layout, "scalars", np.concatenate(
            [[f["inv_gs"]], f["qmul"]]).astype(np.float32))
        fmasks = masks_of(f)
        for k in class_keys:
            if k in fmasks:
                _pack_host(buf, layout, f"tbl{k}", f["big_tables"][k])
                _pack_host(buf, layout, f"mask{k}", fmasks[k])
            # else: zeros already in place (mask all-False)
    dbufs = jax.device_put(bufs)
    dbank = _device_bank(tuple(range(len(FAMILY8))))
    fn_a, fn_b = fn
    res = fn_b(fn_a(dbufs, dbank), dbufs)
    return np.asarray(res) if as_numpy else res
