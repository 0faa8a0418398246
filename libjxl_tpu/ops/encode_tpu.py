"""Fused batched VarDCT encode on device.

TPU-native analogue of enc_xyb.cc + enc_group.cc ComputeCoefficients:
sRGB->linear->XYB (VPU), batched forward DCT (MXU), quantize with CfL
subtraction. The output quantized coefficients stream back to the host
entropy coder; everything heavy stays on device and shards over the
batch/group mesh axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libjxl_tpu.color.constants import (
    DEFAULT_QUANT_BIAS, OPSIN_ABSORBANCE_BIAS, OPSIN_ABSORBANCE_MATRIX,
)
from libjxl_tpu.ops.decode_tpu import adjust_quant_bias_jax
from libjxl_tpu.vardct.dct import dct_matrix


@jax.jit
def srgb_to_xyb(srgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, H, W) sRGB [0,1] -> XYB (enc_xyb.cc LinearRGBToXYB)."""
    linear = jnp.where(srgb <= 0.04045, srgb / 12.92,
                       ((srgb + 0.055) / 1.055) ** 2.4)
    m = jnp.asarray(OPSIN_ABSORBANCE_MATRIX, jnp.float32)
    bias = jnp.asarray(OPSIN_ABSORBANCE_BIAS, jnp.float32)
    mixed = jnp.einsum("ij,...jhw->...ihw", m, linear,
                       preferred_element_type=jnp.float32)
    mixed = jnp.maximum(mixed + bias.reshape(3, 1, 1), 0.0)
    cbrt = jnp.cbrt(mixed) - jnp.cbrt(bias).reshape(3, 1, 1)
    x = 0.5 * (cbrt[..., 0, :, :] - cbrt[..., 1, :, :])
    y = 0.5 * (cbrt[..., 0, :, :] + cbrt[..., 1, :, :])
    b = cbrt[..., 2, :, :]
    return jnp.stack([x, y, b], axis=-3)


@jax.jit
def encode_groups_dct8(xyb: jnp.ndarray, raw_quant: jnp.ndarray,
                       table: jnp.ndarray, inv_table: jnp.ndarray,
                       inv_global_scale: jnp.ndarray,
                       ytox: jnp.ndarray, ytob: jnp.ndarray,
                       qm_mul: jnp.ndarray, mul_dc: jnp.ndarray,
                       biases: jnp.ndarray):
    """(G, 3, BY*8, BX*8) XYB group tiles -> quantized coeffs + DC.

    Returns (coeffs (G,3,BY,BX,64) int32, qdc (G,3,BY,BX) int32).
    """
    g, _, h, w = xyb.shape
    by, bx = h // 8, w // 8
    m8 = jnp.asarray(dct_matrix(8), jnp.float32)
    blocks = xyb.reshape(g, 3, by, 8, bx, 8).transpose(0, 1, 2, 4, 3, 5)
    coef = jnp.einsum("ui,gcbxij,wj->gcbxuw", m8, blocks, m8,
                      preferred_element_type=jnp.float32)
    coef = coef.reshape(g, 3, by, bx, 64)
    dc = coef[..., 0]

    scale = raw_quant.astype(jnp.float32) / inv_global_scale  # (G,BY,BX)
    # Y first.
    qy = jnp.round(coef[:, 1] * inv_table[1][None, None, None]
                   * scale[..., None]).astype(jnp.int32)
    dq_y = adjust_quant_bias_jax(
        jnp.stack([qy, qy, qy], 1), biases)[:, 1] \
        * table[1][None, None, None] / scale[..., None]
    qx = jnp.round((coef[:, 0] - ytox[..., None] * dq_y) * inv_table[0]
                   * scale[..., None] / qm_mul[0]).astype(jnp.int32)
    qb = jnp.round((coef[:, 2] - ytob[..., None] * dq_y) * inv_table[2]
                   * scale[..., None] / qm_mul[2]).astype(jnp.int32)
    q = jnp.stack([qx, qy, qb], axis=1)
    q = q.at[..., 0].set(0)

    # DC quantization (CfL base factors 0/., ytob base 1 handled by caller
    # passing the dc cfl factors inside mul_dc pipeline on host for now).
    qdc_y = jnp.round(dc[:, 1] / mul_dc[1]).astype(jnp.int32)
    y_dec = qdc_y * mul_dc[1]
    qdc_x = jnp.round(dc[:, 0] / mul_dc[0]).astype(jnp.int32)
    qdc_b = jnp.round((dc[:, 2] - y_dec) / mul_dc[2]).astype(jnp.int32)
    qdc = jnp.stack([qdc_x, qdc_y, qdc_b], axis=1)
    return q, qdc


@jax.jit
def roundtrip_metrics(orig: jnp.ndarray, dec: jnp.ndarray):
    """PSNR between two (..., C, H, W) images in [0,1]."""
    mse = jnp.mean((orig - dec) ** 2)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
