"""Device-side loop filters: gaborish + EPF as jittable JAX ops.

Reference: lib/jxl/render_pipeline/stage_gaborish.cc / stage_epf.cc —
same math as pipeline/loop_filters.py (the numpy oracle), expressed
with static shapes so XLA can fuse the SAD/weight chains into the
surrounding decode pipeline; all elementwise, VPU-friendly.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.pipeline.loop_filters import INV_SIGMA_NUM, MIN_SIGMA


def _jnp():
    import jax.numpy as jnp
    return jnp


def gaborish_tpu(img, weights):
    """img: (3, H, W); weights: (3, 2) [w1, w2] per channel."""
    jnp = _jnp()
    outs = []
    for c in range(3):
        w1, w2 = float(weights[c][0]), float(weights[c][1])
        div = 1.0 + 4 * (w1 + w2)
        w0, w1, w2 = 1.0 / div, w1 / div, w2 / div
        p = jnp.pad(img[c], 1, mode="symmetric")
        outs.append(p[1:-1, 1:-1] * w0
                    + (p[1:-1, :-2] + p[1:-1, 2:] + p[:-2, 1:-1]
                       + p[2:, 1:-1]) * w1
                    + (p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2]
                       + p[2:, 2:]) * w2)
    return jnp.stack(outs)


def _sad_mul(h, w, sm, bsm):
    jnp = _jnp()
    xb = (jnp.arange(w) % 8 == 0) | (jnp.arange(w) % 8 == 7)
    yb = (jnp.arange(h) % 8 == 0) | (jnp.arange(h) % 8 == 7)
    mul = jnp.full((h, w), sm, jnp.float32)
    mul = jnp.where(xb[None, :], bsm, mul)
    mul = jnp.where(yb[:, None], bsm, mul)
    return mul


def _expand_blocks(block_map, h, w):
    jnp = _jnp()
    e = jnp.repeat(jnp.repeat(block_map, 8, 0), 8, 1)
    return e[:h, :w]


def _epf_pass(img, inv_sigma_blocks, *, pad, plus, cands, sigma_scale,
              border_sad_mul, channel_scale, single_pixel_sad=False):
    """One EPF pass with the candidate loop ROLLED via lax.scan.

    A Python-unrolled candidate loop duplicates ~5 full-frame ops per
    candidate (12 for pass 0) into the XLA graph; at 4K that graph is
    big enough to OOM the TPU compile helper. The scan body compiles
    once, and each candidate's shifted window is a dynamic_slice into
    the padded frame (offsets are data, not program structure).
    """
    import jax
    jnp = _jnp()
    lax = jax.lax
    _, h, w = img.shape
    sm = sigma_scale * 1.65
    inv_sigma = _expand_blocks(inv_sigma_blocks, h, w) \
        * _sad_mul(h, w, sm, sm * border_sad_mul)
    skip = _expand_blocks(inv_sigma_blocks, h, w) < MIN_SIGMA
    p = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)), mode="symmetric")

    scales = jnp.asarray(channel_scale, jnp.float32)[:, None, None]
    # Shared shifted-difference fields: |at(p) - at(c+p)| equals the
    # per-candidate channel-summed difference field D_c shifted by p,
    # so each candidate needs ONE |diff| computation on a 1-px-extended
    # region plus |plus| cheap shifted adds (~3x fewer elementwise
    # passes than the naive 5-tap form; stage_epf.cc's shared-sum idea
    # restated for whole-frame tensors).
    ext = 1 if plus else 0
    offs = jnp.asarray(cands, jnp.int32)            # (K, 2)

    def body(carry, off):
        acc, wsum = carry
        sy, sx = off[0], off[1]
        at_c = lax.dynamic_slice(p, (0, pad + sy, pad + sx), (3, h, w))
        if single_pixel_sad:
            sad = (jnp.abs(at_c - img) * scales).sum(axis=0)
        else:
            base = p[:, pad - ext:pad - ext + h + 2 * ext,
                     pad - ext:pad - ext + w + 2 * ext]
            offw = lax.dynamic_slice(
                p, (0, pad - ext + sy, pad - ext + sx),
                (3, h + 2 * ext, w + 2 * ext))
            d = (jnp.abs(base - offw) * scales).sum(axis=0)
            sad = sum(d[ext + py:ext + py + h, ext + px:ext + px + w]
                      for (py, px) in plus)
        wgt = jnp.maximum(sad * inv_sigma + 1.0, 0.0)
        return (acc + wgt[None] * at_c, wsum + wgt), None

    (acc, wsum), _ = lax.scan(
        body, (img, jnp.ones((h, w), jnp.float32)), offs)
    return jnp.where(skip[None], img, acc / wsum[None])


_PLUS = ((0, 0), (-1, 0), (0, -1), (1, 0), (0, 1))
_EPF0_OFFSETS = ((-2, 0), (-1, -1), (-1, 0), (-1, 1), (0, -2), (0, -1),
                 (0, 1), (0, 2), (1, -1), (1, 0), (1, 1), (2, 0))
_CROSS = ((-1, 0), (0, -1), (0, 1), (1, 0))


def apply_loop_filters_tpu(img, inv_sigma_blocks, *, epf_iters=2,
                           gab=True,
                           gab_weights=((0.115169525, 0.061248592),) * 3,
                           epf_pass0_sigma_scale=0.9,
                           epf_pass2_sigma_scale=6.5,
                           epf_border_sad_mul=2.0 / 3,
                           epf_channel_scale=(40.0, 5.0, 3.5)):
    """Jittable gaborish + EPF chain (stage order dec_cache.cc:150-170).

    img: (3, H, W) float32; inv_sigma_blocks: (H//8, W//8) 1/sigma per
    block (compute_sigma_map). Static epf_iters/gab select the stages.
    """
    out = img
    if gab:
        out = gaborish_tpu(out, gab_weights)
    common = dict(border_sad_mul=epf_border_sad_mul,
                  channel_scale=epf_channel_scale)
    if epf_iters >= 3:
        out = _epf_pass(out, inv_sigma_blocks, pad=3, plus=_PLUS,
                        cands=_EPF0_OFFSETS,
                        sigma_scale=epf_pass0_sigma_scale, **common)
    if epf_iters >= 1:
        out = _epf_pass(out, inv_sigma_blocks, pad=2, plus=_PLUS,
                        cands=_CROSS, sigma_scale=1.0, **common)
    if epf_iters >= 2:
        out = _epf_pass(out, inv_sigma_blocks, pad=1, plus=None,
                        cands=_CROSS, sigma_scale=epf_pass2_sigma_scale,
                        single_pixel_sad=True, **common)
    return out
