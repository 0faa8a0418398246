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

    # 4a: 8x8 family via masked matmuls over the matrix bank.
    cells = dq.reshape(3, BH, 8, BW, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(3, BH * BW, 64)
    ids = mat_ids.reshape(BH * BW)
    # f32 MXU precision: TPU matmuls default to bf16, which is far too
    # coarse for IDCT (visible banding); force the 3-pass f32 algorithm.
    hi = jax.lax.Precision.HIGHEST
    pix_cells = jnp.zeros_like(cells)
    for slot in range(mat_bank.shape[0]):
        mask = (ids == slot).astype(jnp.float32)[None, :, None]
        pix_cells = pix_cells + jnp.matmul(cells * mask, mat_bank[slot],
                                           precision=hi)
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
    from libjxl_tpu.ops.filters_tpu import apply_loop_filters_tpu

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
                        return_xyb: bool = False):
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
    key = (big_keys, caps, epf_iters, gab, feed["coeff_img"].shape,
           image_h, image_w, return_xyb)
    if key not in _FN_CACHE:
        if return_xyb:
            from libjxl_tpu.ops.filters_tpu import apply_loop_filters_tpu

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

    if gab or epf_iters > 0:
        inv_sigma = compute_sigma_map(lf, raw_quant, sharpness,
                                      quantizer.global_scale_float)
    else:
        inv_sigma = np.zeros_like(raw_quant, dtype=np.float32)

    big_flat = []
    for k in big_keys:
        big_flat.extend(feed["big"][k])
    out = fn(feed["coeff_img"], feed["weight_img"], feed["llf_img"],
             feed["fx"], feed["fb"], family8_matrices(), feed["mat_ids"],
             feed["biases"], inv_sigma.astype(np.float32), *big_flat)
    return np.asarray(out)
