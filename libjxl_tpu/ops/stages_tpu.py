"""Device render-pipeline post-stages: learned upsampling + noise.

JAX ports of render_pipeline/stage_upsampling.cc (per-phase 5x5
kernels with 5x5-window min/max clamping) and stage_noise.cc
(ConvolveNoise + AddNoise). The raw xorshift128+ noise planes depend
only on (frame shape, group_dim, frame index) — never on pixel content
(dec_noise.cc Random3Planes) — so they are host-computed once per
shape and cached as device constants; the per-image work (5x5
laplacian, strength LUT, chroma-correlated blend) runs jitted after
the loop-filter stage.
"""

from __future__ import annotations

import functools

import numpy as np


def _jnp():
    import jax
    import jax.numpy as jnp
    return jax, jnp


# ---------------------------------------------------------------------------
# Learned 2x/4x/8x upsampling


def upsample_plane_tpu(plane, n: int, kernels):
    """plane (H, W) -> (H*n, W*n); kernels (n, n, 5, 5) float32
    (pipeline/upsample._kernels). Mirrors upsample_plane: per-phase
    5x5 dot products, each clamped to its source window min/max."""
    jax, jnp = _jnp()
    h, w = plane.shape
    p = jnp.pad(plane, 2, mode="symmetric")

    def win(dy, dx):
        return jax.lax.slice(p, (dy, dx), (dy + h, dx + w))

    wins = [[win(dy, dx) for dx in range(5)] for dy in range(5)]
    flat = jnp.stack([wins[dy][dx] for dy in range(5) for dx in range(5)])
    mins = flat.min(axis=0)
    maxs = flat.max(axis=0)
    k = jnp.asarray(kernels, jnp.float32).reshape(n * n, 25)
    # (n*n, H, W) phase outputs
    phases = jnp.einsum("pk,khw->phw", k,
                        flat.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
    phases = jnp.clip(phases, mins[None], maxs[None])
    phases = phases.reshape(n, n, h, w)
    return phases.transpose(2, 0, 3, 1).reshape(h * n, w * n)


def upsample_image_tpu(planes, n: int, kernels):
    jax, jnp = _jnp()
    return jnp.stack([upsample_plane_tpu(planes[c], n, kernels)
                      for c in range(3)])


# ---------------------------------------------------------------------------
# Noise synthesis (stage_noise.cc)


@functools.lru_cache(maxsize=8)
def _cached_noise_planes(h: int, w: int, group_dim: int,
                         visible_frame_index: int):
    from libjxl_tpu.frame.noise import synthesize_noise_planes
    return synthesize_noise_planes(h, w, group_dim, visible_frame_index)


def noise_planes_for(h: int, w: int, group_dim: int,
                     visible_frame_index: int = 1) -> np.ndarray:
    """Content-independent raw noise planes (host, cached per shape)."""
    return _cached_noise_planes(h, w, group_dim, visible_frame_index)


def _laplacian5_tpu(plane):
    """ConvolveNoiseStage: 0.16 * (5x5 sum - center) - 3.84 * center,
    symmetric borders."""
    jax, jnp = _jnp()
    h, w = plane.shape
    p = jnp.pad(plane, 2, mode="symmetric")
    acc = jnp.zeros_like(plane)
    for dy in range(5):
        for dx in range(5):
            if dy == 2 and dx == 2:
                continue
            acc = acc + jax.lax.slice(p, (dy, dx), (dy + h, dx + w))
    return acc * 0.16 + plane * -3.84


def _strength_lut_tpu(lut, x):
    jax, jnp = _jnp()
    n_points = lut.shape[0]
    scale = n_points - 2
    sx = jnp.maximum(0.0, x * scale)
    fx = jnp.floor(sx)
    frac = sx - fx
    over = sx >= scale + 1
    fx = jnp.where(over, float(scale), fx).astype(jnp.int32)
    frac = jnp.where(over, 1.0, frac)
    lo = lut[fx]
    hi = lut[jnp.minimum(fx + 1, n_points - 1)]
    v = lo * (1.0 - frac) + hi * frac
    return jnp.clip(v, 0.0, 1.0)


def add_noise_tpu(xyb, raw_planes, lut, ytox, ytob):
    """Jittable AddNoiseStage: xyb (3, H, W), raw_planes (3, H, W)
    device-resident random fields, lut (8,) strength curve."""
    jax, jnp = _jnp()
    rnd = jnp.stack([_laplacian5_tpu(raw_planes[c]) for c in range(3)])
    norm_const = jnp.float32(0.22)
    k_rg_corr = jnp.float32(0.9921875)
    k_rgn_corr = jnp.float32(0.0078125)
    vx, vy = xyb[0], xyb[1]
    strength_g = _strength_lut_tpu(lut, (vy - vx) * 0.5)
    strength_r = _strength_lut_tpu(lut, (vy + vx) * 0.5)
    nr = rnd[0] * norm_const
    ng = rnd[1] * norm_const
    nc = rnd[2] * norm_const
    red_noise = strength_r * (k_rgn_corr * nr + k_rg_corr * nc)
    green_noise = strength_g * (k_rgn_corr * ng + k_rg_corr * nc)
    rg_noise = red_noise + green_noise
    return jnp.stack([
        xyb[0] + ytox * rg_noise + (red_noise - green_noise),
        xyb[1] + rg_noise,
        xyb[2] + ytob * rg_noise,
    ])


# ---------------------------------------------------------------------------
# Spline rendering (stage order: after upsampling/patches, before noise)


_SPLINE_R = 48   # max splat window radius handled on device


def spline_stroke_params(splines, cmap):
    """Host geometry walk of render_splines (Catmull-Rom -> equally
    spaced arc samples -> per-sample color/sigma), WITHOUT drawing.
    Returns (cy, cx, sigma, intensity, color3, radius) float32 arrays,
    or None when any stroke's splat radius exceeds the device window
    (caller falls back to the host renderer)."""
    import math

    from libjxl_tpu.frame import splines as SP

    y_to_x = cmap.base_correlation_x
    y_to_b = cmap.base_correlation_b
    rows = []
    for qs, start in zip(splines.splines, splines.starting_points):
        cps, color_dct, sigma_dct = SP._dequantize(
            qs, start, splines.quantization_adjustment, y_to_x, y_to_b)
        if len(cps) > 1 and any(a == b for a, b in zip(cps, cps[1:])):
            from libjxl_tpu.base.errors import BitstreamError
            raise BitstreamError(
                "identical successive spline control points")
        dense = SP._catmull_rom(cps)
        arc_length = (len(dense) - 2) * SP.DESIRED_RENDERING_DISTANCE
        pts = SP._equally_spaced(dense)
        inv_arc = 1.0 / arc_length if arc_length > 0 else 0.0
        for k, (pt, mult) in enumerate(pts):
            progress = min(1.0, k * SP.DESIRED_RENDERING_DISTANCE
                           * inv_arc)
            t31 = 31.0 * progress
            color = np.array([SP._continuous_idct(color_dct[c], t31)
                              for c in range(3)])
            sigma = SP._continuous_idct(sigma_dct, t31)
            if not (np.isfinite(sigma) and sigma != 0.0
                    and np.isfinite(mult)):
                continue
            max_color = max(0.01, float(np.max(np.abs(color * mult))))
            arg = -2.0 * sigma * sigma * (math.log(0.1) * 5
                                          - math.log(max_color))
            if arg <= 0:
                continue
            r = math.sqrt(arg)
            if r > _SPLINE_R:
                return None
            rows.append((pt[1], pt[0], sigma, mult, color))
    n = len(rows)
    cap = max(64, 1 << (n - 1).bit_length()) if n else 64
    cy = np.zeros(cap, np.float32)
    cx = np.zeros(cap, np.float32)
    sig = np.ones(cap, np.float32)
    inten = np.zeros(cap, np.float32)     # zero-padding draws nothing
    col = np.zeros((cap, 3), np.float32)
    for i, (a, b, c_, d, e) in enumerate(rows):
        cy[i], cx[i], sig[i], inten[i] = a, b, c_, d
        col[i] = e
    return cy, cx, sig, inten, col


def render_splines_tpu(xyb, cy, cx, sig, inten, col):
    """Jittable additive erf-profile strokes (splines.cc DrawSegment):
    every stroke drawn as a (2R+1)^2 splat scatter-added into the
    frame; zero-intensity padding entries contribute nothing."""
    jax, jnp = _jnp()
    R = _SPLINE_R
    _, h, w = xyb.shape
    n = cy.shape[0]
    y0 = jnp.clip(jnp.round(cy).astype(jnp.int32) - R, -2 * R, h)
    x0 = jnp.clip(jnp.round(cx).astype(jnp.int32) - R, -2 * R, w)
    yy = y0[:, None] + jnp.arange(2 * R + 1)[None, :]
    xx = x0[:, None] + jnp.arange(2 * R + 1)[None, :]
    dy = yy.astype(jnp.float32) - cy[:, None]
    dx = xx.astype(jnp.float32) - cx[:, None]
    dist = jnp.sqrt(dy[:, :, None] ** 2 + dx[:, None, :] ** 2)
    inv_sigma = (1.0 / sig)[:, None, None]
    c = 0.353553391
    factor = jax.scipy.special.erf((dist * 0.5 + c) * inv_sigma) \
        - jax.scipy.special.erf((dist * 0.5 - c) * inv_sigma)
    local = (0.25 * sig * inten)[:, None, None] * factor * factor
    valid = ((yy[:, :, None] >= 0) & (yy[:, :, None] < h)
             & (xx[:, None, :] >= 0) & (xx[:, None, :] < w))
    lin = (jnp.clip(yy[:, :, None], 0, h - 1) * w
           + jnp.clip(xx[:, None, :], 0, w - 1))
    contrib = jnp.where(valid, local, 0.0)
    flat = xyb.reshape(3, h * w)
    for ch in range(3):
        flat = flat.at[ch, lin.reshape(n, -1)].add(
            (contrib * col[:, ch][:, None, None]).reshape(n, -1))
    return flat.reshape(3, h, w)


# ---------------------------------------------------------------------------
# Spot-color + frame-blending stages (render_pipeline/stage_spot.cc,
# stage_blending.cc / blending.cc PerformBlending as jitted device ops)

@functools.lru_cache(maxsize=8)
def _spot_fn(n_spots: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(color3, mixes, spot_rgba):
        # color3 (3,H,W); mixes (N,H,W) in [0,1]; spot_rgba (N,4).
        for i in range(n_spots):
            mix = mixes[i] * spot_rgba[i, 3]
            color3 = (mix[None] * spot_rgba[i, :3, None, None]
                      + (1.0 - mix)[None] * color3)
        return color3

    return run


def render_spot_tpu(color3, mixes, spot_rgba):
    """Device spot-color mix: p = mix*spot_rgb + (1-mix)*p per spot
    channel, fused into one jitted program (stage_spot.cc)."""
    import jax.numpy as jnp
    mixes = jnp.asarray(mixes, jnp.float32)
    return _spot_fn(mixes.shape[0])(
        jnp.asarray(color3, jnp.float32), mixes,
        jnp.asarray(spot_rgba, jnp.float32))


@functools.lru_cache(maxsize=16)
def _blend_fn(mode: int, premul: bool, has_sa: bool, has_da: bool):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(canvas, canvas_alpha, src, src_alpha, y0, x0):
        # canvas (H,W,3); src (h,w,3); alphas (.,.) or zero-size dummy.
        bh, bw = src.shape[0], src.shape[1]
        d = lax.dynamic_slice(canvas, (y0, x0, 0), (bh, bw, 3))
        da = lax.dynamic_slice(canvas_alpha, (y0, x0), (bh, bw)) \
            if has_da else jnp.ones((bh, bw), jnp.float32)
        sa = src_alpha if has_sa else jnp.ones((bh, bw), jnp.float32)
        new_a = da
        if mode == 0:      # REPLACE
            out = src
            new_a = sa
        elif mode == 1:    # ADD
            out = d + src
            new_a = jnp.clip(da + sa, 0.0, 1.0) if has_sa else da
        elif mode == 4:    # MUL
            out = d * src
        elif mode == 2:    # BLEND
            if premul:
                out = src + d * (1.0 - sa)[..., None]
                new_a = sa + da * (1.0 - sa)
            else:
                new_a = sa + da * (1.0 - sa)
                safe = jnp.where(new_a == 0, 1.0, new_a)
                out = (src * sa[..., None]
                       + d * (da * (1.0 - sa))[..., None]) / safe[..., None]
                out = jnp.where((new_a == 0)[..., None], 0.0, out)
        elif mode == 3:    # ALPHA_WEIGHTED_ADD
            out = d + src * sa[..., None]
            new_a = jnp.clip(da + sa, 0.0, 1.0) if has_sa else da
        else:
            raise ValueError(f"unknown blend mode {mode}")
        canvas = lax.dynamic_update_slice(canvas, out, (y0, x0, 0))
        if has_da:
            canvas_alpha = lax.dynamic_update_slice(
                canvas_alpha, new_a, (y0, x0))
        return canvas, canvas_alpha

    return run


def blend_frame_tpu(canvas, canvas_alpha, src, src_alpha, mode: int,
                    x0: int, y0: int,
                    alpha_is_premultiplied: bool = False):
    """Device frame blending (blending.cc PerformBlending): returns the
    updated (canvas, canvas_alpha) as device arrays so an animation's
    canvas persists on-device between frames. The blit rect is clipped
    host-side (static shapes for jit); offsets stay traced so varying
    frame origins reuse one compiled program per src shape."""
    import jax.numpy as jnp
    import numpy as np
    h, w = src.shape[0], src.shape[1]
    ch, cw = canvas.shape[0], canvas.shape[1]
    sx0, sy0 = max(0, -x0), max(0, -y0)
    dx0, dy0 = max(0, x0), max(0, y0)
    bw = min(w - sx0, cw - dx0)
    bh = min(h - sy0, ch - dy0)
    if bw <= 0 or bh <= 0:
        return canvas, canvas_alpha
    s = jnp.asarray(np.ascontiguousarray(
        src[sy0:sy0 + bh, sx0:sx0 + bw]), jnp.float32)
    has_sa = src_alpha is not None
    sa = jnp.asarray(np.ascontiguousarray(
        src_alpha[sy0:sy0 + bh, sx0:sx0 + bw]), jnp.float32) \
        if has_sa else jnp.zeros((0, 0), jnp.float32)
    has_da = canvas_alpha is not None
    ca = canvas_alpha if has_da else jnp.zeros((0, 0), jnp.float32)
    fn = _blend_fn(int(mode), bool(alpha_is_premultiplied), has_sa,
                   has_da)
    canvas, ca = fn(jnp.asarray(canvas, jnp.float32), ca, s, sa,
                    dy0, dx0)
    return canvas, (ca if has_da else None)
