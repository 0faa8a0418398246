"""SSIMULACRA2 perceptual metric.

Reference: tools/ssimulacra2.cc (537 LoC) — 6-scale XYB multi-scale
SSIM' with ringing/blur edge maps and a tuned 108-weight sum. Ported
with the same constants; the recursive Gaussian is replaced by an FIR
Gaussian (sigma 1.5, radius 8), numerically close.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.color.xyb import linear_rgb_to_xyb, srgb_to_linear
from libjxl_tpu.metrics.ssimulacra2_weights import WEIGHTS

_C2 = 0.0009
_NUM_SCALES = 6


def _gauss_kernel(sigma: float = 1.5, radius: int = 8) -> np.ndarray:
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


_KERNEL = _gauss_kernel()


def _blur_plane(img: np.ndarray) -> np.ndarray:
    r = len(_KERNEL) // 2
    p = np.pad(img, ((r, r), (0, 0)), mode="symmetric")
    out = np.zeros_like(img)
    for i, k in enumerate(_KERNEL):
        out += k * p[i:i + img.shape[0], :]
    p = np.pad(out, ((0, 0), (r, r)), mode="symmetric")
    out2 = np.zeros_like(img)
    for i, k in enumerate(_KERNEL):
        out2 += k * p[:, i:i + img.shape[1]]
    return out2


def _blur(img3: np.ndarray) -> np.ndarray:
    return np.stack([_blur_plane(img3[c]) for c in range(3)])


def _downsample2(img3: np.ndarray) -> np.ndarray:
    c, h, w = img3.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    pad = np.pad(img3, ((0, 0), (0, oh * 2 - h), (0, ow * 2 - w)),
                 mode="edge")
    return pad.reshape(c, oh, 2, ow, 2).mean(axis=(2, 4))


def _positive_xyb(xyb: np.ndarray) -> np.ndarray:
    x, y, b = xyb
    return np.stack([x * 14.0 + 0.42, y + 0.01, (b - y) + 0.55])


def _quartic(v):
    v2 = v * v
    return v2 * v2


def _ssim_map(mu1, mu2, s11, s22, s12) -> np.ndarray:
    out = np.zeros(6)
    n = mu1[0].size
    for c in range(3):
        m1, m2 = mu1[c], mu2[c]
        num_m = 1.0 - (m1 - m2) ** 2
        num_s = 2 * (s12[c] - m1 * m2) + _C2
        denom_s = (s11[c] - m1 * m1) + (s22[c] - m2 * m2) + _C2
        d = np.maximum(1.0 - num_m * num_s / denom_s, 0.0)
        out[c * 2] = d.sum() / n
        out[c * 2 + 1] = (np.sum(_quartic(d)) / n) ** 0.25
    return out


def _edge_diff_map(img1, mu1, img2, mu2) -> np.ndarray:
    out = np.zeros(12)
    n = img1[0].size
    for c in range(3):
        d1 = (1.0 + np.abs(img2[c] - mu2[c])) \
            / (1.0 + np.abs(img1[c] - mu1[c])) - 1.0
        artifact = np.maximum(d1, 0.0)
        detail_lost = np.maximum(-d1, 0.0)
        out[c * 4] = artifact.sum() / n
        out[c * 4 + 1] = (np.sum(_quartic(artifact)) / n) ** 0.25
        out[c * 4 + 2] = detail_lost.sum() / n
        out[c * 4 + 3] = (np.sum(_quartic(detail_lost)) / n) ** 0.25
    return out


def ssimulacra2(orig: np.ndarray, dist: np.ndarray) -> float:
    """Score in (-inf, 100]; ~90 visually lossless, <50 low quality.

    orig/dist: (H, W, 3) uint8/float sRGB."""
    def prep(im):
        im = np.asarray(im)
        if im.dtype == np.uint8:
            im = im.astype(np.float32) / 255.0
        elif im.dtype == np.uint16:
            im = im.astype(np.float32) / 65535.0
        return srgb_to_linear(im.transpose(2, 0, 1))

    lin1, lin2 = prep(orig), prep(dist)
    scores = []
    for scale in range(_NUM_SCALES):
        if lin1.shape[1] < 8 or lin1.shape[2] < 8:
            break
        if scale:
            lin1 = _downsample2(lin1)
            lin2 = _downsample2(lin2)
        img1 = _positive_xyb(linear_rgb_to_xyb(lin1).astype(np.float64))
        img2 = _positive_xyb(linear_rgb_to_xyb(lin2).astype(np.float64))
        mu1 = _blur(img1)
        mu2 = _blur(img2)
        s11 = _blur(img1 * img1)
        s22 = _blur(img2 * img2)
        s12 = _blur(img1 * img2)
        avg_ssim = _ssim_map(mu1, mu2, s11, s22, s12)
        avg_edge = _edge_diff_map(img1, mu1, img2, mu2)
        scores.append((avg_ssim, avg_edge))

    ssim = 0.0
    i = 0
    # NOTE: like the reference, the weight index advances only over
    # scales that actually ran (ssimulacra2.cc:412-444).
    for c in range(3):
        for (avg_ssim, avg_edge) in scores:
            for n in range(2):
                ssim += WEIGHTS[i] * abs(avg_ssim[c * 2 + n]); i += 1
                ssim += WEIGHTS[i] * abs(avg_edge[c * 4 + n]); i += 1
                ssim += WEIGHTS[i] * abs(avg_edge[c * 4 + n + 2]); i += 1
    ssim *= 0.9562382616834844
    ssim = (2.326765642916932 * ssim - 0.020884521182843837 * ssim * ssim
            + 6.248496625763138e-05 * ssim ** 3)
    if ssim > 0:
        return float(100.0 - 10.0 * ssim ** 0.6276336467831387)
    return 100.0
