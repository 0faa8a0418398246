"""Device (TPU) VarDCT encoder compute stage.

JAX ports of the encoder's numeric pipeline — XYB forward + gaborish
inverse + adaptive-quant masking field (enc_adaptive_quantization.cc),
batched trial-DCT AC-strategy search (enc_ac_strategy.cc), forward
DCTs, CfL fit (enc_chroma_from_luma.cc), per-block quant adjustment and
dead-zone quantization (enc_group.cc ComputeCoefficients) — so
`encode(img, device=True)` runs everything between pixels and tokens on
the device. The host keeps header/TOC/entropy writing.

Big transforms use the same dense aligned-tile formulation as the
decoder: every (cy, cx)-aligned tile is transformed/quantized densely
and per-tile masks select which tiles are real — no gathers.

Numerics are float32 (the host reference path mixes float64), so the
produced bitstream can differ from the host encoder in occasional +-1
quantization decisions; parity is validated by size and metric, not
bit-equality (tests/test_device_encode.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from libjxl_tpu.frame.adaptive_quant import (
    _GABORISH_INV, _SG_MUL, _SG_RET_MUL, _SG_VOFFSET, INV_LOG2E, K_AC_QUANT,
)
from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct.dct import dct_matrix, idct_matrix, resample_scales

HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Stage A: pixels -> XYB (+gaborish inverse) + adaptive-quant field


def _ratio_of_derivatives(v, invert: bool):
    eps = 1e-2
    v = jnp.maximum(v, 0.0)
    num_mul = _SG_RET_MUL * 3 * _SG_MUL
    v_offset = _SG_VOFFSET * INV_LOG2E + eps
    den_mul = INV_LOG2E * _SG_MUL
    v2 = v * v
    num = num_mul * v2 + eps
    den = den_mul * v * v2 + v_offset
    return num / den if invert else den / num


def _masking_sqrt(v):
    k_log_offset = 27.505837037000106
    k_mul = 211.66567973503678
    return 0.25 * jnp.sqrt(v * np.sqrt(k_mul * 1e8) + k_log_offset)


def _compute_mask(out_val):
    k_base = -0.7647
    k_mul4 = 9.4708735624378946
    k_mul2 = 17.35036561631863
    k_offset2 = 302.59587815579727
    k_mul3 = 6.7943250517376494
    k_offset3 = 3.7179635626140772
    k_offset4 = 0.25 * k_offset3
    k_mul0 = 0.80061762862741759
    v1 = jnp.maximum(out_val * k_mul0, 1e-3)
    v2 = 1.0 / (v1 + k_offset2)
    v3 = 1.0 / (v1 * v1 + k_offset3)
    v4 = 1.0 / (v1 * v1 + k_offset4)
    return k_base + k_mul4 * v4 + k_mul2 * v2 + k_mul3 * v3


def _block_reduce_sum(img, n: int):
    h, w = img.shape
    return img.reshape(h // n, n, w // n, n).sum(axis=(1, 3))


def _fuzzy_erosion(pre, butteraugli_target: float):
    k_mul_base = np.array([0.125, 0.1, 0.09, 0.06])
    k_mul_add = np.array([0.0, -0.1, -0.09, -0.06])
    mul = max(0.0, (2.0 - butteraugli_target) / 2.0) \
        if butteraugli_target < 2.0 else 0.0
    k_mul = k_mul_base + mul * k_mul_add
    k_mul = k_mul * (0.29959705784054957 / k_mul.sum())
    h, w = pre.shape
    p = jnp.pad(pre, 1, mode="edge")
    neighbors = jnp.stack([p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                           for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    part = jnp.sort(neighbors, axis=0)[:4]
    v = (jnp.asarray(k_mul, jnp.float32)[:, None, None] * part).sum(axis=0)
    return _block_reduce_sum(v, 2)


def initial_quant_field_jnp(butteraugli_target: float, xyb,
                            rescale: float = 1.0):
    """InitialQuantField (enc_adaptive_quantization.cc:1264), f32."""
    y_plane = xyb[1]
    match_gamma_offset = 0.019
    limit = 0.2
    p = jnp.pad(y_plane, 1, mode="edge")
    h, w = y_plane.shape
    base = 0.25 * (p[2:, 1:-1] + p[:-2, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:])
    gammac = _ratio_of_derivatives(y_plane + match_gamma_offset, False)
    diff = gammac * (y_plane - base)
    diff = jnp.minimum(diff * diff, limit)
    diff = _masking_sqrt(diff)
    pre_erosion = _block_reduce_sum(diff, 4) * 0.25
    aq_map = _fuzzy_erosion(pre_erosion, butteraugli_target)

    scale = K_AC_QUANT / butteraugli_target * rescale
    mask_val = _compute_mask(aq_map)
    # GammaModulation
    k_bias = 0.16
    iny = y_plane + k_bias
    r = _ratio_of_derivatives(iny - xyb[0], True)
    g = _ratio_of_derivatives(iny + xyb[0], True)
    overall = _block_reduce_sum(r + g, 8) * (0.5 / 64)
    k_gamma = 0.1005613337192697
    mask_val = mask_val + k_gamma * jnp.log2(jnp.maximum(overall, 1e-9))
    # HfModulation
    valmin = 0.0206
    dx = jnp.minimum(jnp.abs(jnp.diff(y_plane, axis=1)), valmin)
    dy = jnp.minimum(jnp.abs(jnp.diff(y_plane, axis=0)), valmin)
    dx_f = jnp.zeros((h, w)).at[:, :w - 1].set(dx).at[:, 7::8].set(0)
    dy_f = jnp.zeros((h, w)).at[:h - 1, :].set(dy).at[7::8, :].set(0)
    sum_y = _block_reduce_sum(dx_f + dy_f, 8)
    out_val = mask_val + sum_y * -0.38 + 0.42
    # BlueModulation
    k_limit = 0.010474084867598155
    k_offset = 0.0031994768654636393
    k_mul = 0.90590804735610064
    k_max_limit = 15.463398341612438
    p_y_eff = y_plane + k_offset + jnp.abs(xyb[0])
    contrib = jnp.where(xyb[2] > p_y_eff,
                        jnp.minimum(xyb[2] - p_y_eff, k_limit), 0.0)
    s = _block_reduce_sum(contrib, 8)
    s = jnp.where(s >= 32 * k_limit, 64 * k_limit - s, s)
    s = jnp.minimum(s, k_max_limit * k_limit)
    blue = mask_val + s * k_mul
    out_val = jnp.minimum(out_val, blue)

    base_level = 0.48 * scale
    k_ramp_start, k_ramp_end = 2.0, 14.0
    dampen = 1.0
    if butteraugli_target >= k_ramp_start:
        dampen = max(0.0, 1.0 - (butteraugli_target - k_ramp_start)
                     / (k_ramp_end - k_ramp_start))
    mul = scale * dampen
    add = (1.0 - dampen) * base_level
    return jnp.exp(out_val) * mul + add


def gaborish_inverse_jnp(xyb, mul: float = 1.0):
    """GaborishInverse: symmetric 5x5 sharpen (enc_gaborish.cc:20-72)."""
    k = _GABORISH_INV
    s = 1.0 + mul * 4 * (k[0] + k[1] + k[2] + k[4] + 2 * k[3])
    s = max(s, 1e-5)
    norm = 1.0 / s
    nm = mul * norm
    ker = np.zeros((5, 5))
    ker[2, 2] = norm
    for (dy, dx), wv in (((0, 1), nm * k[0]), ((0, 2), nm * k[2]),
                         ((1, 1), nm * k[1]), ((2, 2), nm * k[4]),
                         ((1, 2), nm * k[3])):
        for sy in (-1, 1):
            for sx in (-1, 1):
                ker[2 + sy * dy, 2 + sx * dx] = wv
                ker[2 + sy * dx, 2 + sx * dy] = wv
    _, h, w = xyb.shape
    p = jnp.pad(xyb, ((0, 0), (2, 2), (2, 2)), mode="symmetric")
    acc = jnp.zeros_like(xyb)
    for dy in range(5):
        for dx in range(5):
            if ker[dy, dx] != 0:
                acc = acc + ker[dy, dx] * p[:, dy:dy + h, dx:dx + w]
    return acc


@functools.partial(jax.jit, static_argnames=("distance", "gab", "flat_qf"))
def encode_stage_pre(xyb, distance: float, gab: bool,
                     flat_qf: bool = False):
    """Pre-gaborish XYB -> (qf, stage-B input XYB), both device-resident.

    The adaptive-quant field reads PRE-gaborish pixels while the coded
    planes are gaborish-inverted (enc_heuristics.cc:1109,1121) — fusing
    both here keeps one host->device transfer and drops the host numpy
    gaborish_inverse from the device encode path."""
    if flat_qf:
        _, h, w = xyb.shape
        qf = jnp.full((h // 8, w // 8), 0.52 / max(distance, 0.1),
                      jnp.float32)
    else:
        qf = initial_quant_field_jnp(distance, xyb)
    return qf, (gaborish_inverse_jnp(xyb) if gab else xyb)


@jax.jit
def srgb_to_xyb(srgb):
    """(..., 3, H, W) sRGB [0,1] -> XYB (enc_xyb.cc LinearRGBToXYB)."""
    from libjxl_tpu.color.constants import (
        OPSIN_ABSORBANCE_BIAS, OPSIN_ABSORBANCE_MATRIX,
    )
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


@functools.partial(jax.jit, static_argnames=("distance", "gab", "flat_qf"))
def encode_stage_a(linear, distance: float, gab: bool,
                   flat_qf: bool = False):
    """linear (3, H, W) linear RGB (block-padded) -> (xyb, qf).

    xyb has the gaborish inverse applied when gab. qf is the
    per-8x8-block adaptive quant field (flat for effort<=2)."""
    from libjxl_tpu.color.constants import (
        OPSIN_ABSORBANCE_BIAS, OPSIN_ABSORBANCE_MATRIX,
    )
    m = jnp.asarray(OPSIN_ABSORBANCE_MATRIX, jnp.float32)
    bias = jnp.asarray(OPSIN_ABSORBANCE_BIAS, jnp.float32)
    mixed = jnp.einsum("ij,jhw->ihw", m, linear, precision=HI) \
        + bias[:, None, None]
    mixed = jnp.maximum(mixed, 0.0)
    cbrt = jnp.cbrt(mixed) - jnp.cbrt(bias)[:, None, None]
    xyb = jnp.stack([0.5 * (cbrt[0] - cbrt[1]),
                     0.5 * (cbrt[0] + cbrt[1]), cbrt[2]])
    if flat_qf:
        _, h, w = xyb.shape
        qf = jnp.full((h // 8, w // 8), 0.52 / max(distance, 0.1),
                      jnp.float32)
    else:
        qf = initial_quant_field_jnp(distance, xyb)
    if gab:
        xyb = gaborish_inverse_jnp(xyb)
    return xyb, qf


# ---------------------------------------------------------------------------
# Stage B: XYB + raw quant field -> strategies, quantized coefficients,
# DC, CfL maps.

_MERGE_FACTOR = 0.92
_BLOCK_OVERHEAD = 2.0


def _bits_proxy_jnp(q, axis):
    a = jnp.abs(q)
    return (jnp.log2(1.0 + a).sum(axis=axis)
            + 1.3 * (a > 0).sum(axis=axis) + _BLOCK_OVERHEAD)


def _tile_max(a, cy, cx):
    by, bx = a.shape
    return a[:by // cy * cy, :bx // cx * cx] \
        .reshape(by // cy, cy, bx // cx, cx).max(axis=(1, 3))


def _tile_sum(a, cy, cx):
    by, bx = a.shape
    return a[:by // cy * cy, :bx // cx * cx] \
        .reshape(by // cy, cy, bx // cx, cx).sum(axis=(1, 3))


def _fwd_dct_tiles(y, cy8, cx8):
    """Dense forward DCT of every (cy8, cx8) pixel tile of plane(s) y
    (..., H, W) -> (..., TH, TW, cy8, cx8) coefficient grids (stored
    orientation applied by caller)."""
    h, w = y.shape[-2:]
    th, tw = h // cy8, w // cx8
    tiles = y.reshape(y.shape[:-2] + (th, cy8, tw, cx8))
    tiles = jnp.moveaxis(tiles, -3, -2)      # (..., th, tw, cy8, cx8)
    mr = jnp.asarray(dct_matrix(cy8), jnp.float32)
    mc = jnp.asarray(dct_matrix(cx8), jnp.float32)
    return jnp.einsum("ui,...ij,wj->...uw", mr, tiles, mc, precision=HI)


def acs_select_jnp(y, raw_quant, inv_gs, inv8y, inv16y, inv32y, inv64y,
                   invwy, invty, *, enable_16, enable_32, enable_64,
                   enable_rect, big_factor=_MERGE_FACTOR,
                   merge16=_MERGE_FACTOR):
    """select_strategies (frame/acs_select.py) as pure array ops.

    Returns the (BY, BX) strategy map with -1 on covered blocks."""
    h, w = y.shape
    by, bx = h // 8, w // 8
    strategies = jnp.zeros((by, bx), jnp.int32)
    if not (enable_16 or enable_32 or enable_rect):
        return strategies

    coef8 = _fwd_dct_tiles(y, 8, 8)
    scale8 = raw_quant.astype(jnp.float32) / inv_gs
    q8 = jnp.round(coef8.reshape(by, bx, 64) * inv8y
                   * scale8[..., None])
    q8 = q8.at[..., 0].set(0)
    bits8 = _bits_proxy_jnp(q8, axis=-1)

    accept16 = None
    bits16 = None
    cover = jnp.zeros((by, bx), jnp.bool_)   # covered by any merge
    if enable_16 and by >= 2 and bx >= 2:
        ty, tx = by // 2, bx // 2
        coef16 = _fwd_dct_tiles(y[:ty * 16, :tx * 16], 16, 16)
        rq16 = _tile_max(raw_quant, 2, 2).astype(jnp.float32)
        sc16 = (rq16 / inv_gs)[..., None, None]
        q16 = jnp.round(coef16 * inv16y * sc16)
        q16 = q16.at[..., :2, :2].set(0)
        bits16 = _bits_proxy_jnp(q16, axis=(-2, -1))
        bits8_t = _tile_sum(bits8, 2, 2)
        accept16 = bits16 < bits8_t * merge16

        accept32 = None
        bits32 = None
        if enable_32 and ty >= 2 and tx >= 2:
            qy, qx = by // 4, bx // 4
            cand = _tile_sum(accept16[:qy * 2, :qx * 2].astype(jnp.int32),
                             2, 2) == 4
            coef32 = _fwd_dct_tiles(y[:qy * 32, :qx * 32], 32, 32)
            rq32 = _tile_max(raw_quant, 4, 4).astype(jnp.float32)
            sc32 = (rq32 / inv_gs)[..., None, None]
            q32 = jnp.round(coef32 * inv32y * sc32)
            q32 = q32.at[..., :4, :4].set(0)
            bits32 = _bits_proxy_jnp(q32, axis=(-2, -1))
            bits16_q = _tile_sum(bits16[:qy * 2, :qx * 2], 2, 2)
            accept32 = cand & (bits32 < bits16_q * big_factor)

        accept64 = None
        if enable_32 and enable_64 and accept32 is not None \
                and by >= 8 and bx >= 8:
            qy, qx = accept32.shape
            oy, ox = qy // 2, qx // 2
            if oy and ox:
                cand64 = _tile_sum(
                    accept32[:oy * 2, :ox * 2].astype(jnp.int32), 2, 2) == 4
                coef64 = _fwd_dct_tiles(y[:oy * 64, :ox * 64], 64, 64)
                rq64 = _tile_max(raw_quant, 8, 8).astype(jnp.float32)
                sc64 = (rq64 / inv_gs)[..., None, None]
                q64 = jnp.round(coef64 * inv64y * sc64)
                q64 = q64.at[..., :8, :8].set(0)
                bits64 = _bits_proxy_jnp(q64, axis=(-2, -1))
                bits32_o = _tile_sum(bits32[:oy * 2, :ox * 2], 2, 2)
                accept64 = cand64 & (bits64 < bits32_o * big_factor)

        # Apply largest-first precedence: 64 wins over 32 wins over 16.
        def expand(mask, cy, cx):
            m = jnp.repeat(jnp.repeat(mask, cy, axis=0), cx, axis=1)
            full = jnp.zeros((by, bx), jnp.bool_)
            return full.at[:m.shape[0], :m.shape[1]].set(m)

        if accept64 is not None:
            c64 = expand(accept64, 8, 8)
            an64 = jnp.zeros((by, bx), jnp.bool_).at[
                :accept64.shape[0] * 8:8, :accept64.shape[1] * 8:8
            ].set(accept64)
        else:
            c64 = jnp.zeros((by, bx), jnp.bool_)
            an64 = jnp.zeros((by, bx), jnp.bool_)
        if accept32 is not None:
            a32 = accept32 & ~_tile_max(
                c64.astype(jnp.int32), 4, 4)[:accept32.shape[0],
                                             :accept32.shape[1]].astype(bool)
            c32 = expand(a32, 4, 4)
            an32 = jnp.zeros((by, bx), jnp.bool_).at[
                :a32.shape[0] * 4:4, :a32.shape[1] * 4:4].set(a32)
        else:
            c32 = jnp.zeros((by, bx), jnp.bool_)
            an32 = jnp.zeros((by, bx), jnp.bool_)
        a16 = accept16 & ~_tile_max((c64 | c32).astype(jnp.int32), 2, 2)[
            :accept16.shape[0], :accept16.shape[1]].astype(bool)
        c16 = expand(a16, 2, 2)
        an16 = jnp.zeros((by, bx), jnp.bool_).at[
            :a16.shape[0] * 2:2, :a16.shape[1] * 2:2].set(a16)
        cover = c64 | c32 | c16
        strategies = jnp.where(cover, -1, strategies)
        strategies = jnp.where(an64, acs.DCT64X64, strategies)
        strategies = jnp.where(an32, acs.DCT32X32, strategies)
        strategies = jnp.where(an16, acs.DCT16X16, strategies)

    # 16-wide pairs (DCT8X16) on remaining DCT8 blocks.
    if enable_rect and bx >= 2:
        px = bx // 2
        coefw = _fwd_dct_tiles(y[:, :px * 16], 8, 16)  # (by,px,8,16)
        rqw = _tile_max(raw_quant, 1, 2).astype(jnp.float32)
        scw = (rqw / inv_gs)[..., None, None]
        qw = jnp.round(coefw * invwy * scw)
        qw = qw.at[..., :1, :2].set(0)
        bitsw = _bits_proxy_jnp(qw, axis=(-2, -1))
        bits8_p = _tile_sum(bits8, 1, 2)
        free = (~cover[:, 0:px * 2:2]) & (~cover[:, 1:px * 2:2]) \
            & (strategies[:, 0:px * 2:2] == acs.DCT8X8) \
            & (strategies[:, 1:px * 2:2] == acs.DCT8X8)
        accept_w = free & (bitsw < bits8_p * big_factor)
        strategies = strategies.at[:, 0:px * 2:2].set(
            jnp.where(accept_w, acs.DCT8X16, strategies[:, 0:px * 2:2]))
        strategies = strategies.at[:, 1:px * 2:2].set(
            jnp.where(accept_w, -1, strategies[:, 1:px * 2:2]))
        cover = cover.at[:, 0:px * 2:2].set(cover[:, 0:px * 2:2] | accept_w)
        cover = cover.at[:, 1:px * 2:2].set(cover[:, 1:px * 2:2] | accept_w)

    # 16-tall pairs (DCT16X8).
    if enable_rect and by >= 2:
        py = by // 2
        coeft = _fwd_dct_tiles(y[:py * 16, :], 16, 8)  # (py,bx,16,8)
        coeft = jnp.swapaxes(coeft, -1, -2)            # stored (8,16)
        rqt = _tile_max(raw_quant, 2, 1).astype(jnp.float32)
        sct = (rqt / inv_gs)[..., None, None]
        qt = jnp.round(coeft * invty * sct)
        qt = qt.at[..., :1, :2].set(0)
        bitst = _bits_proxy_jnp(qt, axis=(-2, -1))
        bits8_t = _tile_sum(bits8, 2, 1)
        free = (strategies[0:py * 2:2, :] == acs.DCT8X8) \
            & (strategies[1:py * 2:2, :] == acs.DCT8X8)
        accept_t = free & (bitst < bits8_t * big_factor)
        strategies = strategies.at[0:py * 2:2, :].set(
            jnp.where(accept_t, acs.DCT16X8, strategies[0:py * 2:2, :]))
        strategies = strategies.at[1:py * 2:2, :].set(
            jnp.where(accept_t, -1, strategies[1:py * 2:2, :]))
    return strategies

# Big-transform classes handled densely: (cy, cx) -> strategy id.
BIG_CLASSES = {(2, 2): acs.DCT16X16, (4, 4): acs.DCT32X32,
               (8, 8): acs.DCT64X64, (1, 2): acs.DCT8X16,
               (2, 1): acs.DCT16X8}


def _adjust_quant_blocks_jnp(coeffs, flat_inv, raw_quant, inv_gs,
                             x_mul, b_mul, dct8_mask, quant_max):
    """AdjustQuantBlockAC (enc_group.cc:104-330), f32 port of
    frame/encode_frame.py _adjust_quant_blocks."""
    pos = np.arange(64)
    row, col = pos // 8, pos % 8
    quad = ((row >= 4).astype(np.int64) * 2 + (col >= 4))
    notllf = jnp.asarray(pos != 0)
    hf_region = jnp.asarray((((row >= 7) & (col >= 7))
                             | (((row == 7) | (col == 7))
                                & (row >= 4) & (col >= 4))))
    quad_masks = [jnp.asarray((quad == i) & (pos != 0)) for i in range(4)]

    quant0 = raw_quant.astype(jnp.float32)
    scale0 = quant0 / inv_gs
    qmul = {1: 1.0, 0: x_mul, 2: b_mul}
    hf_mul = {0: 70.0, 1: 30.0, 2: 60.0}
    trial_thr = np.array([0.58, 0.64, 0.64, 0.64], np.float32)
    thr_quad = jnp.asarray(trial_thr[quad])

    quant_final = jnp.zeros_like(quant0)
    thr_y = jnp.broadcast_to(jnp.asarray(trial_thr),
                             raw_quant.shape + (4,))
    for c in (1, 0, 2):
        thr = jnp.broadcast_to(jnp.asarray(trial_thr),
                               raw_quant.shape + (4,))
        val = coeffs[c] * flat_inv[c] * (scale0 * qmul[c])[..., None]
        v = jnp.where(jnp.abs(val) >= thr_quad, jnp.round(val), 0.0)
        av = jnp.abs(v) * notllf
        err = jnp.abs(val - v) * notllf
        hfnz = jnp.stack([jnp.where(m, av, 0).sum(-1)
                          for m in quad_masks], -1)
        sum_vals = av.sum(-1)
        sum_hf = jnp.where((v != 0) & hf_region & notllf,
                           jnp.abs(val), 0).sum(-1)
        quant = quant0
        if c == 1:
            hfme = jnp.stack(
                [jnp.where(m & (v == 0), err, 0).max(-1)
                 for m in quad_masks], -1)
            allzero = sum_vals * 8 < 1.0
            bump = allzero & ((hfnz[..., 1:] == 0)
                              & (hfme[..., 1:] > 0.46)).any(-1)
            new_quant = quant + bump
            ratio = new_quant / quant
            cond3 = allzero & (hfnz[..., 3] == 0) & (hfme[..., 3] > 0.46)
            cond12 = allzero & ~cond3 & (
                ((hfnz[..., 1] == 0) & (hfme[..., 1] > 0.46))
                | ((hfnz[..., 2] == 0) & (hfme[..., 2] > 0.46)))
            cond0 = allzero & ~cond3 & ~cond12 \
                & (hfnz[..., 0] == 0) & (hfme[..., 0] > 0.46)
            t3 = jnp.where(cond3, 0.9999 * hfme[..., 3] * ratio,
                           thr[..., 3])
            t12 = 0.9999 * jnp.maximum(hfme[..., 1], hfme[..., 2]) * ratio
            t1 = jnp.where(cond12, t12, thr[..., 1])
            t2 = jnp.where(cond12, t12, thr[..., 2])
            t0 = jnp.where(cond0, 0.9999 * hfme[..., 0] * ratio,
                           thr[..., 0])
            thr = jnp.stack([t0, t1, t2, t3], axis=-1)
            quant = new_quant
        allnz = hfnz.sum(-1) + 1.0
        boost = hf_mul[c] * sum_hf
        quant = jnp.where(boost >= allnz,
                          jnp.minimum(quant + jnp.trunc(boost / allnz),
                                      quant_max - 1), quant)
        quant = jnp.where(hfnz.sum(-1) < 11,
                          jnp.minimum(quant + 1, quant_max - 1), quant)
        min_hf = hfnz.min(-1)
        activity = jnp.where(min_hf < 15.0, jnp.trunc(min_hf), 15.0)
        if c == 1:
            thr = thr.at[..., 1:].add(0.01 * activity[..., None])
            thr_y = thr
        qp = quant - activity
        limit = jnp.maximum(4, jnp.trunc(quant / 2))
        qp = jnp.maximum(qp, limit)
        quant_final = jnp.maximum(quant_final, qp)

    new_rq = jnp.where(dct8_mask, quant_final.astype(jnp.int32),
                       raw_quant)
    return new_rq, thr_y


def _fit_cfl_jnp(coeffs, inv_table, raw_quant, quant_scale):
    """fit_cfl_maps (frame/cfl_fit.py), vectorized over 64x64 tiles."""
    from libjxl_tpu.vardct.cfl import DEFAULT_COLOR_FACTOR
    _, by, bx, _ = coeffs.shape
    ty, tx = -(-by // 8), -(-bx // 8)
    k_distance_mul_ac = 1e-9
    k_strange = 128.0
    ac = coeffs.at[..., 0].set(0.0)
    q = quant_scale * k_strange * raw_quant.astype(jnp.float32)
    # Pad to tile multiples; padded blocks contribute zero.
    pby, pbx = ty * 8, tx * 8
    acp = jnp.pad(ac, ((0, 0), (0, pby - by), (0, pbx - bx), (0, 0)))
    qp = jnp.pad(q, ((0, pby - by), (0, pbx - bx)))

    def tile_sum(a):
        # (pby, pbx, 64) -> (ty, tx) sums over blocks and coefficients
        return a.reshape(ty, 8, tx, 8, 64).sum(axis=(1, 3, 4))

    def fit(vm_w, vs_w, base):
        # vm_w/vs_w: (pby, pbx, 64) weighted coefficient arrays.
        # Precise FindBestMultiplier (enc_chroma_from_luma.cc CFLFunction
        # + Newton, the squirrel-and-slower path; mirrors
        # frame/cfl_fit.py): up to 20 damped Newton steps per tile on
        # the saturated robust cost, with the saturation mask taken
        # from the CENTRAL residual for all three derivative samples.
        a = vm_w / DEFAULT_COLOR_FACTOR
        b = base * vm_w - vs_w
        # per-tile sample count: full tiles have 8*8*64 samples, edge
        # tiles fewer; count real blocks per tile.
        ones = jnp.pad(jnp.ones((by, bx)), ((0, pby - by), (0, pbx - bx)))
        n = ones.reshape(ty, 8, tx, 8).sum(axis=(1, 3)) * 64
        k2 = (1.0 / 3) * 2.0
        eps = 100.0
        reg = 2 * k_distance_mul_ac * n

        def expand(t):
            return jnp.repeat(jnp.repeat(t, 8, 0), 8, 1)[..., None]

        def dsum(xe, keep):
            vv = a * xe + b
            d = k2 * a * (jnp.abs(vv) + 1.0)
            d = jnp.where(vv < 0, -d, d)
            return tile_sum(jnp.where(keep, d, 0.0))

        x = jnp.zeros((ty, tx), jnp.float32)
        done = jnp.zeros((ty, tx), bool)
        for _ in range(20):
            xe = expand(x)
            keep = jnp.abs(a * xe + b) < 100.0
            fd = reg * x + dsum(xe, keep)
            fpe = reg * (x + eps) + dsum(xe + eps, keep)
            fme = reg * (x - eps) + dsum(xe - eps, keep)
            step = fd / ((fpe - fme) / (2 * eps) + 0.85)
            x = jnp.where(done, x, x - jnp.clip(step, -20.0, 20.0))
            done = done | (jnp.abs(step) < 3e-3)
        towards_zero = 2.6
        x = jnp.where(x >= towards_zero, x - towards_zero,
                      jnp.where(x <= -towards_zero, x + towards_zero, 0.0))
        return jnp.clip(jnp.round(x), -128, 127).astype(jnp.int32)

    wy_x = acp[1] * inv_table[0] * qp[..., None]
    wx = acp[0] * inv_table[0] * qp[..., None]
    wy_b = acp[1] * inv_table[2] * qp[..., None]
    wb = acp[2] * inv_table[2] * qp[..., None]
    return fit(wy_x, wx, 0.0), fit(wy_b, wb, 1.0)


def _deadzone_thr(rows, cols, chroma, covered):
    thr = np.array([0.58, 0.62, 0.62, 0.62] if chroma
                   else [0.56, 0.62, 0.62, 0.62], np.float32)
    if chroma and covered >= 4:
        thr = np.maximum(thr - 0.00744 * covered, 0.5)
    yy = (np.arange(rows) >= rows // 2).astype(np.int64) * 2
    xx = (np.arange(cols) >= cols // 2).astype(np.int64)
    return thr[yy[:, None] + xx[None, :]]


def _qdz(val, thr):
    return jnp.where(jnp.abs(val) >= thr, jnp.round(val), 0.0)


_BY_BIAS = 1.0 - 0.07005449891748593


def _adjust_bias_y(q):
    gen = q - 0.145 / jnp.where(q == 0, 1.0, q)
    return jnp.where(q == 0, 0.0,
                     jnp.where(q == 1, _BY_BIAS,
                               jnp.where(q == -1, -_BY_BIAS, gen)))


def encode_stage_b(xyb, raw_quant, inv_gs, x_mul, b_mul, mul_dc, cfl_fac,
                   tables, *, effort: int, quant_max: int,
                   base_cx: float, base_cb: float, color_scale: float,
                   fixed_strategies=None, big_factor=_MERGE_FACTOR,
                   merge16=_MERGE_FACTOR):
    """XYB + raw quant field -> strategies, quantized coefficients, DC,
    CfL maps (compute_vardct_encoding's device half). All dense."""
    _, H, W = xyb.shape
    BY, BX = H // 8, W // 8

    # ---- AC strategy selection ----
    if fixed_strategies is not None:
        strategies = fixed_strategies
    elif effort <= 3:
        strategies = jnp.zeros((BY, BX), jnp.int32)
    else:
        strategies = acs_select_jnp(
            xyb[1], raw_quant, inv_gs, tables["inv8y"], tables["inv16y"],
            tables["inv32y"], tables["inv64y"], tables["invwy"],
            tables["invty"],
            enable_16=True, enable_32=effort >= 5,
            enable_rect=effort >= 6, enable_64=effort >= 7,
            big_factor=big_factor, merge16=merge16)

    # ---- AdjustQuantField: uniform (max) qf within multi-block
    # strategies, dense per class ----
    rq = raw_quant
    class_masks = {}
    for (cy, cx), sid in BIG_CLASSES.items():
        if BY // cy == 0 or BX // cx == 0:
            class_masks[(cy, cx)] = None
            continue
        m = strategies[:BY // cy * cy:cy, :BX // cx * cx:cx] == sid
        class_masks[(cy, cx)] = m
        if cy == 1 and cx == 1:
            continue
        tby, tbx = m.shape
        rqc = rq[:tby * cy, :tbx * cx]
        rqt = rqc.reshape(tby, cy, tbx, cx).max(axis=(1, 3))
        spread = jnp.repeat(jnp.repeat(rqt, cy, 0), cx, 1)
        sel = jnp.repeat(jnp.repeat(m, cy, 0), cx, 1)
        rq = rq.at[:tby * cy, :tbx * cx].set(
            jnp.where(sel, spread, rqc))
    raw_quant = rq

    # ---- Forward 8x8 DCT (stored layout) + DC ----
    coef8 = _fwd_dct_tiles(xyb, 8, 8)              # (3, BY, BX, 8, 8)
    dc_float = coef8[..., 0, 0]
    coef8s = jnp.swapaxes(coef8, -1, -2).reshape(3, BY, BX, 64)

    # ---- Big classes: dense fwd DCT + DC-from-LLF ----
    big = {}
    for (cy, cx), sid in BIG_CLASSES.items():
        m = class_masks[(cy, cx)]
        if m is None:
            big[(cy, cx)] = None
            continue
        tby, tbx = m.shape
        ph, pw = tby * cy * 8, tbx * cx * 8
        coef = _fwd_dct_tiles(xyb[:, :ph, :pw], cy * 8, cx * 8)
        if cy >= cx:
            coef = jnp.swapaxes(coef, -1, -2)      # stored layout
        # DC from LLF (dct_scales.h DCTResampleScales): slice the STORED
        # grid then un-transpose, exactly as the host encoder does.
        ly, lx = acs.coefficient_layout(cy, cx)
        llf = coef[..., :ly, :lx]
        if cy >= cx:
            llf = jnp.swapaxes(llf, -1, -2)        # -> (cy, cx)
        sy = jnp.asarray(resample_scales(cy, cy * 8), jnp.float32)
        sx = jnp.asarray(resample_scales(cx, cx * 8), jnp.float32)
        ir = jnp.asarray(idct_matrix(cy), jnp.float32)
        ic = jnp.asarray(idct_matrix(cx), jnp.float32)
        dcb = jnp.einsum("yu,cabuv,xv->cabyx", ir,
                         llf / (sy[:, None] * sx[None, :]), ic,
                         precision=HI)             # (3, tby, tbx, cy, cx)
        sel = m[None, :, :, None, None]
        dcm = jnp.where(sel, dcb, jnp.moveaxis(
            dc_float[:, :tby * cy, :tbx * cx].reshape(3, tby, cy, tbx, cx),
            2, 3))
        dc_float = dc_float.at[:, :tby * cy, :tbx * cx].set(
            jnp.moveaxis(dcm, 3, 2).reshape(3, tby * cy, tbx * cx))
        big[(cy, cx)] = coef.reshape(3, tby, tbx, cy * cx * 64)

    # ---- DC quantization with CfL ----
    qdc1 = jnp.round(dc_float[1] / mul_dc[1])
    y_dec = qdc1 * mul_dc[1]
    qdc0 = jnp.round((dc_float[0] - cfl_fac[0] * y_dec) / mul_dc[0])
    qdc2 = jnp.round((dc_float[2] - cfl_fac[2] * y_dec) / mul_dc[2])
    qdc = jnp.stack([qdc0, qdc1, qdc2]).astype(jnp.int32)

    # ---- CfL fit (on the 8x8 coefficients) ----
    flat_inv = tables["i8"]
    if effort <= 2:
        ty, tx = -(-BY // 8), -(-BX // 8)
        ytox_map = jnp.zeros((ty, tx), jnp.int32)
        ytob_map = jnp.zeros((ty, tx), jnp.int32)
    else:
        ytox_map, ytob_map = _fit_cfl_jnp(coef8s, flat_inv, raw_quant,
                                          1.0 / inv_gs)

    # ---- 8x8 quantization ----
    scale = raw_quant.astype(jnp.float32) / inv_gs
    tile_idx_y = np.arange(BY) // 8
    tile_idx_x = np.arange(BX) // 8
    fx_b = base_cx + ytox_map[jnp.ix_(tile_idx_y, tile_idx_x)] * color_scale
    fb_b = base_cb + ytob_map[jnp.ix_(tile_idx_y, tile_idx_x)] * color_scale
    thr_c8 = jnp.asarray(_deadzone_thr(8, 8, True, 1).reshape(64))
    if effort >= 5:
        dct8_mask = strategies == acs.DCT8X8
        raw_quant, thr_y_quad = _adjust_quant_blocks_jnp(
            coef8s, flat_inv, raw_quant, inv_gs, x_mul, b_mul,
            dct8_mask, quant_max)
        scale = raw_quant.astype(jnp.float32) / inv_gs
        pos64 = np.arange(64)
        quad64 = ((pos64 // 8 >= 4).astype(np.int64) * 2
                  + (pos64 % 8 >= 4))
        thr_y8 = thr_y_quad[..., quad64]
    else:
        thr_y8 = jnp.asarray(_deadzone_thr(8, 8, False, 1).reshape(64))
    sc = scale[..., None]
    qy = _qdz(coef8s[1] * flat_inv[1] * sc, thr_y8)
    dq_y = _adjust_bias_y(qy) * tables["t8"][1] / sc
    qx = _qdz((coef8s[0] - fx_b[..., None] * dq_y)
              * flat_inv[0] * (sc * x_mul), thr_c8)
    qb = _qdz((coef8s[2] - fb_b[..., None] * dq_y)
              * flat_inv[2] * (sc * b_mul), thr_c8)
    qall = jnp.stack([qx, qy, qb]).astype(jnp.int32)
    qall = qall.at[..., 0].set(0)

    # ---- big-class quantization (dense) ----
    big_q = {}
    for (cy, cx), coef in big.items():
        if coef is None:
            big_q[(cy, cx)] = None
            continue
        tby, tbx = class_masks[(cy, cx)].shape
        ly, lx = acs.coefficient_layout(cy, cx)
        size = cy * cx * 64
        t_s = tables[f"t{cy}x{cx}"]                # (3, size)
        inv_s = 1.0 / t_s
        sc_s = (raw_quant[:tby * cy:cy, :tbx * cx:cx]
                .astype(jnp.float32) / inv_gs)[..., None]
        fx_t = fx_b[:tby * cy:cy, :tbx * cx:cx][..., None]
        fb_t = fb_b[:tby * cy:cy, :tbx * cx:cx][..., None]
        thr_yb = jnp.asarray(
            _deadzone_thr(ly * 8, lx * 8, False, cy * cx).reshape(size))
        thr_cb = jnp.asarray(
            _deadzone_thr(ly * 8, lx * 8, True, cy * cx).reshape(size))
        q1 = _qdz(coef[1] * inv_s[1] * sc_s, thr_yb)
        dqy = _adjust_bias_y(q1) * t_s[1] / sc_s
        q0 = _qdz((coef[0] - fx_t * dqy) * inv_s[0] * (sc_s * x_mul),
                  thr_cb)
        q2 = _qdz((coef[2] - fb_t * dqy) * inv_s[2] * (sc_s * b_mul),
                  thr_cb)
        qn = jnp.stack([q0, q1, q2], axis=0).astype(jnp.int32)
        llf_zero = np.zeros((ly * 8, lx * 8), bool)
        llf_zero[:ly, :lx] = True
        qn = qn * jnp.asarray(~llf_zero.ravel(), jnp.int32)
        big_q[(cy, cx)] = qn

    big_q_s = {f"{cy}x{cx}": v for (cy, cx), v in big_q.items()
               if v is not None}
    return dict(strategies=strategies, raw_quant=raw_quant, qall=qall,
                big_q=big_q_s, dc_float=dc_float, qdc=qdc,
                ytox_map=ytox_map, ytob_map=ytob_map)


_STAGE_B_JIT: dict = {}


def stage_b_jitted(effort: int, quant_max: int, base_cx: float,
                   base_cb: float, color_scale: float,
                   with_fixed: bool = False,
                   big_factor: float = _MERGE_FACTOR,
                   merge16: float = _MERGE_FACTOR):
    key = (effort, quant_max, base_cx, base_cb, color_scale, with_fixed,
           big_factor, merge16)
    if key not in _STAGE_B_JIT:
        if with_fixed:
            def fn(xyb, raw_quant, inv_gs, x_mul, b_mul, mul_dc, cfl_fac,
                   tables, fixed_strategies):
                return encode_stage_b(
                    xyb, raw_quant, inv_gs, x_mul, b_mul, mul_dc,
                    cfl_fac, tables, effort=effort, quant_max=quant_max,
                    base_cx=base_cx, base_cb=base_cb,
                    color_scale=color_scale, big_factor=big_factor,
                    merge16=merge16,
                    fixed_strategies=fixed_strategies)
        else:
            def fn(xyb, raw_quant, inv_gs, x_mul, b_mul, mul_dc, cfl_fac,
                   tables):
                return encode_stage_b(
                    xyb, raw_quant, inv_gs, x_mul, b_mul, mul_dc,
                    cfl_fac, tables, effort=effort, quant_max=quant_max,
                    base_cx=base_cx, base_cb=base_cb,
                    color_scale=color_scale, big_factor=big_factor,
                    merge16=merge16)
        _STAGE_B_JIT[key] = jax.jit(fn)
    return _STAGE_B_JIT[key]


def make_tables(matrices) -> dict:
    """Dequant-table bundle for stage B (cached on the matrices)."""
    cached = getattr(matrices, "_device_enc_tables", None)
    if cached is not None:
        return cached
    t8 = matrices.table(acs.DCT8X8).reshape(3, 64).astype(np.float32)
    tables = {
        "t8": t8, "i8": (1.0 / t8).astype(np.float32),
        "inv8y": (1.0 / matrices.table(acs.DCT8X8))[1].ravel()
        .astype(np.float32),
        "inv16y": (1.0 / matrices.table(acs.DCT16X16))[1]
        .astype(np.float32),
        "inv32y": (1.0 / matrices.table(acs.DCT32X32))[1]
        .astype(np.float32),
        "inv64y": (1.0 / matrices.table(acs.DCT64X64))[1]
        .astype(np.float32),
        "invwy": (1.0 / matrices.table(acs.DCT8X16))[1]
        .astype(np.float32),
        "invty": (1.0 / matrices.table(acs.DCT16X8))[1]
        .astype(np.float32),
    }
    for (cy, cx), sid in BIG_CLASSES.items():
        tables[f"t{cy}x{cx}"] = matrices.table(sid).reshape(
            3, cy * cx * 64).astype(np.float32)
    matrices._device_enc_tables = tables
    return tables
