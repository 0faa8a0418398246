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
