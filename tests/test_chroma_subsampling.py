"""Generic chroma-subsampled VarDCT: 420/422 with loop filters and
progressive passes (beyond the JPEG-transcode profile).

The encoder (encode_ycbcr_vardct_frame) produces streams the system
libjxl decoder accepts; differential tests pin our decode to djxl's
within 1 LSB — except a known djxl-0.7 group-seam behavior in the
chroma-upsample+gaborish chain (rows 256k-4 of multigroup 420 gab-only
frames differ by up to ~16/255 from the seamless whole-image result;
conformance is RMSE-based and unaffected).
"""

import numpy as np
import pytest

from libjxl_tpu.api.simple import decode, encode
from libjxl_tpu.extras import refjxl


def _img(h, w, seed=5):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    chans = [np.clip(0.5 + 0.3 * np.sin(x / 17 + c) * np.cos(y / 23)
                     + rng.normal(0, 0.02, (h, w)), 0, 1)
             for c in range(3)]
    return (np.stack(chans, axis=-1) * 255).astype(np.uint8)


@pytest.mark.parametrize("sub", ["420", "422"])
@pytest.mark.parametrize("progressive", [False, True])
@pytest.mark.parametrize("epf", [0, 2])
def test_single_group_matches_djxl(sub, progressive, epf):
    img = _img(200, 250)
    s = encode(img, distance=1.0, chroma_subsampling=sub,
               progressive=progressive, epf=epf)
    ours = decode(s).pixels.astype(int)
    ref = np.asarray(refjxl.decode(s, dtype="uint8").pixels)
    ref = ref.reshape(200, 250, -1)[..., :3].astype(int)
    assert np.abs(ours - ref).max() <= 1


@pytest.mark.parametrize("sub", ["420", "422"])
def test_multigroup_matches_djxl(sub):
    h, w = 520, 420
    img = _img(h, w, seed=9)
    s = encode(img, distance=1.0, chroma_subsampling=sub,
               progressive=True, epf=2)
    ours = decode(s).pixels.astype(int)
    ref = np.asarray(refjxl.decode(s, dtype="uint8").pixels)
    ref = ref.reshape(h, w, -1)[..., :3].astype(int)
    d = np.abs(ours - ref)
    # Away from djxl's group-boundary rows the decodes agree exactly;
    # overall RMSE stays deep below conformance limits.
    interior = np.ones(h, bool)
    for gy in (256, 512):
        interior[max(0, gy - 8):gy] = False
    assert d[interior].max() <= 1
    assert np.sqrt((d.astype(float) ** 2).mean()) < 0.5


@pytest.mark.parametrize("sub", ["420", "422"])
def test_reconstruction_quality(sub):
    img = _img(300, 420)
    s = encode(img, distance=1.0, chroma_subsampling=sub, epf=1)
    out = decode(s).pixels.astype(float)
    assert np.abs(out - img.astype(float)).mean() < 6.0


def test_progressive_sections_decode_with_flush_semantics():
    # Progressive subsampled stream: both passes must combine to the
    # same result as the single-pass stream within quantization noise.
    img = _img(260, 260, seed=3)
    s1 = encode(img, distance=1.0, chroma_subsampling="420",
                progressive=False, epf=0)
    s2 = encode(img, distance=1.0, chroma_subsampling="420",
                progressive=True, epf=0)
    d1 = decode(s1).pixels.astype(int)
    d2 = decode(s2).pixels.astype(int)
    assert np.abs(d1 - d2).max() <= 1


def test_subsampled_rejects_bad_args():
    img = _img(64, 64)
    with pytest.raises(ValueError):
        encode(img, distance=0.0, chroma_subsampling="420")
    with pytest.raises(ValueError):
        encode(img, distance=1.0, chroma_subsampling="411")
