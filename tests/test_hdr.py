"""HDR end-to-end: PQ/HLG transfer functions wired through the lossy
codec path (VERDICT #4 / transfer_functions-inl.h TF_PQ, TF_HLG +
HlgOOTF)."""

import numpy as np
import pytest

from libjxl_tpu.api import simple
from libjxl_tpu.color.transfer_functions import (
    hlg_encoded_from_display, hlg_display_from_encoded,
    pq_display_from_encoded, pq_encoded_from_display)


def _hdr_nits(seed=5, peak=4000.0):
    rng = np.random.default_rng(seed)
    nits = np.clip(
        np.outer(np.sin(np.linspace(0, 7, 96)),
                 np.cos(np.linspace(0, 5, 96)))[..., None] * 800 + 900
        + rng.normal(0, 30, (96, 96, 1)), 0.05, peak)
    nits = np.repeat(nits, 3, 2)
    nits[:, :, 0] *= 0.9
    nits[:, :, 2] *= 1.1
    return nits


def test_pq_lossy_roundtrip_absolute_luminance():
    nits = _hdr_nits()
    pq = pq_encoded_from_display(nits / 10000.0).astype(np.float32)
    data = simple.encode(pq, distance=1.0, effort=5, hdr="pq")
    out = simple.decode(data, float_out=True).pixels
    nits_out = pq_display_from_encoded(out[..., :3].astype(np.float64)) \
        * 10000
    rel = np.abs(nits_out - nits) / np.maximum(nits, 1.0)
    assert np.median(rel) < 0.05
    assert np.quantile(rel, 0.99) < 0.25


def test_hlg_lossy_roundtrip():
    scene = np.clip(_hdr_nits(peak=1000.0) / 1000.0, 1e-4, 1.0)
    hlg = hlg_encoded_from_display(scene).astype(np.float32)
    data = simple.encode(hlg, distance=1.0, effort=5, hdr="hlg")
    out = simple.decode(data, float_out=True).pixels
    scene_out = hlg_display_from_encoded(out[..., :3].astype(np.float64))
    rel = np.abs(scene_out - scene) / np.maximum(scene, 1e-2)
    assert np.median(rel) < 0.05


def test_pq_agrees_with_reference_decoder():
    refjxl = pytest.importorskip("libjxl_tpu.extras.refjxl")
    if not refjxl.available():
        pytest.skip("system libjxl not installed")
    nits = _hdr_nits()
    pq = pq_encoded_from_display(nits / 10000.0).astype(np.float32)
    data = simple.encode(pq, distance=1.0, effort=5, hdr="pq")
    ours = simple.decode(data, float_out=True).pixels[..., :3]
    ref = refjxl.decode(data, dtype="float32").pixels[..., :3]
    assert np.abs(ours - ref).max() < 0.02


def test_float_out_sdr():
    rng = np.random.default_rng(0)
    img = np.clip(rng.normal(128, 30, (64, 64, 3)), 0, 255).astype(np.uint8)
    data = simple.encode(img, distance=1.0, effort=3)
    f = simple.decode(data, float_out=True).pixels
    u = simple.decode(data).pixels
    assert f.dtype == np.float32
    assert np.abs(np.round(f * 255) - u).max() <= 1
