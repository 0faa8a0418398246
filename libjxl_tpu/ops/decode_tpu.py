"""Fused batched VarDCT decode on device.

The TPU-native re-design of lib/jxl/dec_group.cc + the render pipeline:
instead of row-streaming per group on CPU threads, all groups decode as
one batched tensor program — dequant/CfL (VPU), IDCT as matmuls (MXU),
then XYB->linear RGB->sRGB fused by XLA. The group axis shards over the
device mesh for multi-chip throughput.

Layout: coefficients arrive as (G, 3, BY, BX, 64) int32 from the host
entropy decoder (G groups of BY x BX 8x8-blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libjxl_tpu.color.constants import (
    DEFAULT_INVERSE_OPSIN_MATRIX, DEFAULT_QUANT_BIAS, OPSIN_ABSORBANCE_BIAS,
)
from libjxl_tpu.vardct.dct import dct_matrix, idct_matrix


def adjust_quant_bias_jax(q: jnp.ndarray, biases) -> jnp.ndarray:
    """quantizer-inl.h AdjustQuantBias over (..., 3, ..., 64) with
    channel axis 1."""
    x = q.astype(jnp.float32)
    b = jnp.asarray(biases, jnp.float32)
    bias_c = b[:3].reshape(1, 3, *([1] * (x.ndim - 2)))
    general = x - b[3] / jnp.where(x == 0, 1.0, x)
    return jnp.where(x == 0, 0.0,
                     jnp.where(x == 1, bias_c,
                               jnp.where(x == -1, -bias_c, general)))


@functools.partial(jax.jit, static_argnames=())
def decode_groups_dct8(coeffs: jnp.ndarray, dc: jnp.ndarray,
                       raw_quant: jnp.ndarray, table: jnp.ndarray,
                       inv_global_scale: jnp.ndarray,
                       ytox: jnp.ndarray, ytob: jnp.ndarray,
                       qm_mul: jnp.ndarray,
                       biases: jnp.ndarray) -> jnp.ndarray:
    """Dequant + CfL + IDCT for 8x8-only groups.

    coeffs:     (G, 3, BY, BX, 64) int32 quantized AC (LLF slot unused)
    dc:         (G, 3, BY, BX) float32 dequantized DC (CfL applied)
    raw_quant:  (G, BY, BX) int32
    table:      (3, 64) dequant matrix
    ytox/ytob:  (G, BY, BX) float32 per-block CfL factors
    qm_mul:     (3,) x/b qm multipliers
    Returns (G, 3, BY*8, BX*8) float32 XYB pixels.
    """
    g, _, by, bx, _ = coeffs.shape
    scale = (inv_global_scale / raw_quant.astype(jnp.float32))  # (G,BY,BX)
    biased = adjust_quant_bias_jax(coeffs, biases)
    dq = biased * table[None, :, None, None, :] \
        * scale[:, None, :, :, None] \
        * qm_mul[None, :, None, None, None]
    # CfL
    dqx = dq[:, 0] + ytox[..., None] * dq[:, 1]
    dqb = dq[:, 2] + ytob[..., None] * dq[:, 1]
    dq = jnp.stack([dqx, dq[:, 1], dqb], axis=1)
    # LLF = DC
    dq = dq.at[..., 0].set(dc)
    # Batched IDCT via MXU matmuls: (..., 8, 8) -> I8 @ C @ I8^T
    i8 = jnp.asarray(idct_matrix(8), jnp.float32)
    blocks = dq.reshape(g, 3, by, bx, 8, 8)
    pix = jnp.einsum("yu,gcbxuv,wv->gcbxyw", i8, blocks, i8,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    # (G,3,BY,BX,8,8) -> (G,3,BY*8,BX*8)
    pix = pix.transpose(0, 1, 2, 4, 3, 5).reshape(g, 3, by * 8, bx * 8)
    return pix


@jax.jit
def xyb_to_srgb8(xyb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, H, W) XYB -> uint8 sRGB, fused (stage_xyb FastXYBTosRGB8
    analogue)."""
    bias = jnp.asarray(OPSIN_ABSORBANCE_BIAS, jnp.float32)
    bias_cbrt = jnp.cbrt(bias)
    inv_m = jnp.asarray(DEFAULT_INVERSE_OPSIN_MATRIX, jnp.float32)
    x = xyb[..., 0, :, :]
    y = xyb[..., 1, :, :]
    b = xyb[..., 2, :, :]
    gl = y + x + bias_cbrt[0]
    gm = y - x + bias_cbrt[1]
    gs = b + bias_cbrt[2]
    mixed = jnp.stack([gl ** 3 - bias[0], gm ** 3 - bias[1],
                       gs ** 3 - bias[2]], axis=-3)
    linear = jnp.einsum("ij,...jhw->...ihw", inv_m, mixed,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    linear = jnp.clip(linear, 0.0, 1.0)
    srgb = jnp.where(linear <= 0.0031308, linear * 12.92,
                     1.055 * linear ** (1 / 2.4) - 0.055)
    return jnp.clip(jnp.round(srgb * 255.0), 0, 255).astype(jnp.uint8)


@jax.jit
def decode_groups_to_srgb8(coeffs, dc, raw_quant, table, inv_global_scale,
                           ytox, ytob, qm_mul, biases):
    """Full fused device decode: coefficients -> sRGB8 group tiles."""
    xyb = decode_groups_dct8(coeffs, dc, raw_quant, table, inv_global_scale,
                             ytox, ytob, qm_mul, biases)
    return xyb_to_srgb8(xyb)


def example_inputs(num_groups: int = 4, blocks: int = 32, seed: int = 0):
    """Example (coeffs, dc, ...) pytree for compile checks/benches."""
    rng = np.random.default_rng(seed)
    g, b = num_groups, blocks
    coeffs = rng.integers(-20, 20, (g, 3, b, b, 64)).astype(np.int32)
    dc = rng.normal(0, 0.3, (g, 3, b, b)).astype(np.float32)
    raw_quant = rng.integers(1, 200, (g, b, b)).astype(np.int32)
    from libjxl_tpu.vardct.quant_weights import DequantMatrices
    table = DequantMatrices().table(0).reshape(3, 64)
    inv_global_scale = np.float32(32.0)
    ytox = np.zeros((g, b, b), np.float32)
    ytob = np.ones((g, b, b), np.float32)
    qm_mul = np.array([1.25, 1.0, 1.0], np.float32)
    biases = DEFAULT_QUANT_BIAS
    return (coeffs, dc, raw_quant, table, inv_global_scale, ytox, ytob,
            qm_mul, biases)


def xyb_to_pq16(xyb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, H, W) XYB -> uint16 PQ-encoded BT.2100 output, fused on
    device (HDR output stage: XYB linear output is in nits/255 units;
    cms/transfer_functions-inl.h TF_PQ inverse EOTF)."""
    import numpy as np
    bias = np.asarray(OPSIN_ABSORBANCE_BIAS, np.float32)
    bias_cbrt = np.cbrt(bias)
    inv_m = np.asarray(DEFAULT_INVERSE_OPSIN_MATRIX, np.float32)
    x = xyb[..., 0, :, :]
    y = xyb[..., 1, :, :]
    b = xyb[..., 2, :, :]
    gl = y + x + float(bias_cbrt[0])
    gm = y - x + float(bias_cbrt[1])
    gs = b + float(bias_cbrt[2])
    m0 = gl * gl * gl - float(bias[0])
    m1_ = gm * gm * gm - float(bias[1])
    m2_ = gs * gs * gs - float(bias[2])
    # 3x3 opsin inverse as explicit per-channel FMAs: a dot_general with
    # a 3-wide contraction over axis -3 makes XLA transpose the whole
    # frame to a channels-minor layout and back (~20 ms at 4K); nine
    # scalar-weighted adds fuse into the surrounding elementwise code.
    chans = [inv_m[i, 0] * m0 + inv_m[i, 1] * m1_ + inv_m[i, 2] * m2_
             for i in range(3)]
    # nits/255 -> display fraction of 10000 nits, then PQ OETF.
    m1, m2 = 0.1593017578125, 78.84375
    c1, c2, c3 = 0.8359375, 18.8515625, 18.6875
    outs = []
    for lin in chans:
        d = jnp.clip(lin * (255.0 / 10000.0), 0.0, 1.0)
        xp = d ** m1
        pq = ((c1 + c2 * xp) / (1.0 + c3 * xp)) ** m2
        outs.append(jnp.clip(jnp.round(pq * 65535.0), 0, 65535)
                    .astype(jnp.uint16))
    return jnp.stack(outs, axis=-3)
