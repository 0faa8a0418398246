"""Fused gaborish + EPF loop-filter chain as ONE pallas TPU kernel.

The jnp formulation (ops/filters_tpu.py) runs each EPF candidate as a
whole-frame HBM pass: 3 EPF passes x up to 12 candidates x ~5 tensor
ops each read/write the full frame, ~5 GB of HBM traffic at 4K (~25 ms
measured on a v5e). This kernel streams the frame ONCE through VMEM in
full-width row strips with a 7-row halo and computes the entire chain
(gaborish 3x3 -> EPF pass0 -> pass1 -> pass2) per strip, so HBM sees
one read + one write of the frame plus two small sigma planes.

Reference semantics: lib/jxl/render_pipeline/stage_gaborish.cc and
stage_epf.cc (same math as pipeline/loop_filters.py, the numpy oracle).

Edge handling: the caller pre-pads the frame by HALO=7 with symmetric
reflection, and the two sigma planes are built on the same padded grid
with mirrored coordinates. Symmetric padding commutes with every stage
(the stencils and candidate sets are mirror-symmetric, and sigma/
border patterns are mirrored with the same reflection), so the halo
pixels a strip computes for its internal pass chain equal the values
the whole-frame re-padding formulation would produce - the strip
outputs match the sequential whole-frame filters to float rounding
(FMA contraction differs between backends; <=1e-6 observed).
"""

from __future__ import annotations

import functools

import numpy as np

from libjxl_tpu.pipeline.loop_filters import MIN_SIGMA

HALO = 7          # gaborish(1) + epf0(3) + epf1(2) + epf2(1)
LANES = 128

_PLUS = ((0, 0), (-1, 0), (0, -1), (1, 0), (0, 1))
_EPF0_OFFSETS = ((-2, 0), (-1, -1), (-1, 0), (-1, 1), (0, -2), (0, -1),
                 (0, 1), (0, 2), (1, -1), (1, 0), (1, 1), (2, 0))
_CROSS = ((-1, 0), (0, -1), (0, 1), (1, 0))

_DEFAULT_GAB = ((0.115169525, 0.061248592),) * 3


def _gaborish(x, weights):
    """x: (3, R, C) strip; 3x3 stencil, output (3, R-2, C-2)."""
    import jax.numpy as jnp
    outs = []
    for c in range(3):
        w1, w2 = float(weights[c][0]), float(weights[c][1])
        div = 1.0 + 4 * (w1 + w2)
        w0, w1, w2 = 1.0 / div, w1 / div, w2 / div
        p = x[c]
        outs.append(p[1:-1, 1:-1] * w0
                    + (p[1:-1, :-2] + p[1:-1, 2:] + p[:-2, 1:-1]
                       + p[2:, 1:-1]) * w1
                    + (p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2]
                       + p[2:, 2:]) * w2)
    return jnp.stack(outs)


def _epf_pass_vmem(x, inv_sigma, skip, *, halo, plus, cands, scales,
                   single_pixel_sad):
    """One EPF pass on a VMEM-resident strip.

    x: (3, R, C); output (3, R-2*halo, C-2*halo) where halo covers the
    candidate reach (2 for pass0, 1 for the cross passes... pass0 uses
    cands +-2 and plus +-1 -> reach 3). inv_sigma/skip are already
    sliced to the OUTPUT grid (R-2*halo, C-2*halo).
    """
    import jax.numpy as jnp
    _, R, C = x.shape
    h, w = R - 2 * halo, C - 2 * halo
    img = x[:, halo:halo + h, halo:halo + w]
    acc = img
    wsum = jnp.ones((h, w), jnp.float32)
    ext = 1 if plus else 0
    if not single_pixel_sad:
        base = x[:, halo - ext:halo + ext + h, halo - ext:halo + ext + w]

    def wdiff(a, b):
        # Channel-scaled SAD with python-scalar weights (a (3,1,1) array
        # constant would be captured by the kernel, which pallas bans).
        return sum(jnp.abs(a[c] - b[c]) * float(scales[c])
                   for c in range(3))

    for (sy, sx) in cands:
        at_c = x[:, halo + sy:halo + sy + h, halo + sx:halo + sx + w]
        if single_pixel_sad:
            sad = wdiff(at_c, img)
        else:
            offw = x[:, halo - ext + sy:halo + ext + sy + h,
                     halo - ext + sx:halo + ext + sx + w]
            d = wdiff(base, offw)
            sad = sum(d[ext + py:ext + py + h, ext + px:ext + px + w]
                      for (py, px) in plus)
        wgt = jnp.maximum(sad * inv_sigma + 1.0, 0.0)
        acc = acc + wgt[None] * at_c
        wsum = wsum + wgt
    return jnp.where(skip[None], img, acc / wsum[None])


def _build_kernel(epf_iters, gab, gab_weights, p0_scale, p2_scale,
                  channel_scale, th, wp):
    """Kernel factory with explicit static offset bookkeeping."""
    import jax.numpy as jnp  # noqa: F401
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scales = tuple(float(c) for c in channel_scale)

    def kernel(img_hbm, sig_hbm, skip_hbm, out_ref, strip, sig, skip,
               sem0, sem1, sem2):
        i = pl.program_id(0)
        y0 = i * th
        d0 = pltpu.make_async_copy(
            img_hbm.at[:, pl.ds(y0, th + 2 * HALO), :], strip, sem0)
        d1 = pltpu.make_async_copy(
            sig_hbm.at[pl.ds(y0, th + 2 * HALO), :], sig, sem1)
        d2 = pltpu.make_async_copy(
            skip_hbm.at[pl.ds(y0, th + 2 * HALO), :], skip, sem2)
        d0.start()
        d1.start()
        d2.start()
        d0.wait()
        d1.wait()
        d2.wait()

        x = strip[...]            # (3, th + 14, wp)
        sg = sig[...]
        sk = skip[...] != 0
        edge = 0                  # rows/cols consumed from the strip edge
        if gab:
            x = _gaborish(x, gab_weights)
            edge = 1
        if epf_iters >= 3:
            h = x.shape[1] - 6
            w = x.shape[2] - 6
            o = edge + 3
            x = _epf_pass_vmem(
                x, sg[o:o + h, o:o + w] * p0_scale, sk[o:o + h, o:o + w],
                halo=3, plus=_PLUS, cands=_EPF0_OFFSETS, scales=scales,
                single_pixel_sad=False)
            edge += 3
        if epf_iters >= 1:
            h = x.shape[1] - 4
            w = x.shape[2] - 4
            o = edge + 2
            x = _epf_pass_vmem(
                x, sg[o:o + h, o:o + w], sk[o:o + h, o:o + w],
                halo=2, plus=_PLUS, cands=_CROSS, scales=scales,
                single_pixel_sad=False)
            edge += 2
        if epf_iters >= 2:
            h = x.shape[1] - 2
            w = x.shape[2] - 2
            o = edge + 1
            x = _epf_pass_vmem(
                x, sg[o:o + h, o:o + w] * p2_scale, sk[o:o + h, o:o + w],
                halo=1, plus=None, cands=_CROSS, scales=scales,
                single_pixel_sad=True)
            edge += 1
        # Trim whatever halo the enabled stages did not consume.
        rem = HALO - edge
        if rem:
            x = x[:, rem:-rem, rem:-rem]
        out_ref[...] = x

    return kernel


def _mirror_idx(n, pad):
    """Symmetric ('abc' -> 'aabc cc') reflection indices for a padded
    axis of length n + 2*pad."""
    idx = np.arange(-pad, n + pad)
    idx = np.where(idx < 0, -idx - 1, idx)
    idx = np.where(idx >= n, 2 * n - idx - 1, idx)
    return idx


@functools.lru_cache(maxsize=16)
def _compiled_meta(h, w, epf_iters, gab, gab_weights, p0_scale, p2_scale,
                   border_sad_mul, channel_scale):
    """Static geometry + closed kernel for a given config."""
    th = 48
    while h % th and th > 8:
        th //= 2
    hp = -(-h // th) * th
    wp = -(-(w + 2 * HALO) // LANES) * LANES
    return th, hp, wp


_PALLAS_OK: list = [None]   # None = unprobed; True/False cached


def _pallas_usable() -> bool:
    """One-time probe: compile + run the kernel on a tiny frame so an
    experimental-backend pallas failure degrades to the jnp filters
    instead of killing the whole decode program."""
    import os
    if os.environ.get("LIBJXL_TPU_NO_PALLAS"):
        return False
    if _PALLAS_OK[0] is None:
        try:
            import jax.numpy as jnp
            img = jnp.zeros((3, 16, 16), jnp.float32)
            sig = jnp.ones((2, 2), jnp.float32)
            out = apply_loop_filters_pallas(img, sig, epf_iters=1,
                                            gab=True)
            out.block_until_ready()
            _PALLAS_OK[0] = True
        except Exception:
            _PALLAS_OK[0] = False
    return _PALLAS_OK[0]


def apply_loop_filters_auto(img, inv_sigma_blocks, *, epf_iters=2,
                            gab=True, **kw):
    """Loop-filter chain: the fused pallas kernel on TPU backends, the
    jnp whole-frame formulation elsewhere (CPU tests, sharded meshes).
    Extra keyword params (custom gaborish weights / EPF tuning) are
    forwarded to both paths."""
    import jax
    plat = jax.default_backend()
    if plat not in ("cpu",) and _pallas_usable():
        return apply_loop_filters_pallas(img, inv_sigma_blocks,
                                         epf_iters=epf_iters, gab=gab,
                                         **kw)
    from libjxl_tpu.ops.filters_tpu import apply_loop_filters_tpu
    return apply_loop_filters_tpu(img, inv_sigma_blocks,
                                  epf_iters=epf_iters, gab=gab, **kw)


def apply_loop_filters_pallas(img, inv_sigma_blocks, *, epf_iters=2,
                              gab=True,
                              gab_weights=_DEFAULT_GAB,
                              epf_pass0_sigma_scale=0.9,
                              epf_pass2_sigma_scale=6.5,
                              epf_border_sad_mul=2.0 / 3,
                              epf_channel_scale=(40.0, 5.0, 3.5),
                              interpret=False):
    """Drop-in replacement for apply_loop_filters_tpu running the whole
    gaborish+EPF chain in one pallas kernel (one HBM read + write)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not gab and epf_iters <= 0:
        return img

    _, h, w = img.shape
    th, hp, wp = _compiled_meta(
        h, w, epf_iters, gab, tuple(map(tuple, gab_weights)),
        epf_pass0_sigma_scale, epf_pass2_sigma_scale, epf_border_sad_mul,
        tuple(epf_channel_scale))

    # --- padded frame: symmetric HALO, then zero-fill to (hp, wp) ---
    yi = _mirror_idx(h, HALO)
    xi = _mirror_idx(w, HALO)
    p = img[:, yi, :][:, :, xi]                       # (3, h+14, w+14)
    p = jnp.pad(p, ((0, 0), (0, hp + 2 * HALO - p.shape[1]),
                    (0, wp - p.shape[2])))

    # --- sigma planes on the same padded grid ---
    # sig = expand(blocks) * 1.65 * border_pattern, mirrored; a pass's
    # inv_sigma is sig * sigma_scale (border ratio is pass-invariant).
    # skip = expand(blocks) < MIN_SIGMA, mirrored.
    ys = yi
    xs = xi
    sm_pat_y = ((ys % 8 == 0) | (ys % 8 == 7))
    sm_pat_x = ((xs % 8 == 0) | (xs % 8 == 7))
    border = sm_pat_y[:, None] | sm_pat_x[None, :]
    blocks_px = inv_sigma_blocks[ys // 8, :][:, xs // 8]
    sig = blocks_px * jnp.where(border, 1.65 * epf_border_sad_mul, 1.65)
    skip = (blocks_px < MIN_SIGMA).astype(jnp.float32)
    sig = jnp.pad(sig, ((0, hp + 2 * HALO - sig.shape[0]),
                        (0, wp - sig.shape[1])))
    skip = jnp.pad(skip, ((0, hp + 2 * HALO - skip.shape[0]),
                          (0, wp - skip.shape[1])))

    kernel = _build_kernel(epf_iters, gab, tuple(map(tuple, gab_weights)),
                           epf_pass0_sigma_scale, epf_pass2_sigma_scale,
                           tuple(epf_channel_scale), th, wp)

    grid = (hp // th,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, hp, wp - 2 * HALO),
                                       jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec((3, th, wp - 2 * HALO),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, th + 2 * HALO, wp), jnp.float32),
            pltpu.VMEM((th + 2 * HALO, wp), jnp.float32),
            pltpu.VMEM((th + 2 * HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(p, sig, skip)
    return out[:, :h, :w]
