"""Modular codec roundtrips (mirrors reference modular_test.cc)."""

import random

import numpy as np
import pytest

from libjxl_tpu.bitstream import BitReader, BitWriter
from libjxl_tpu.modular.codec import (
    GroupHeader, SqueezeParams, Transform, TransformId,
    modular_decode, modular_encode,
)
from libjxl_tpu.modular.image import Channel, ModularImage
from libjxl_tpu.modular.predict import (
    P_AVG4, P_GRADIENT, P_SELECT, P_TOP, P_WEIGHTED, P_ZERO, WPHeader,
)
from libjxl_tpu.modular.transforms import (
    fwd_rct, fwd_squeeze, inv_rct, inv_squeeze, meta_squeeze,
    default_squeeze_parameters, smooth_tendency, _smooth_tendency_vec,
)
from libjxl_tpu.modular.tree import (
    TreeNode, build_fixed_tree_list, decode_tree, encode_tree, leaf,
)


def _rand_image(rng, w, h, nchan=3, depth=8):
    planes = [np.array([[rng.randrange(0, 1 << depth) for _ in range(w)]
                        for _ in range(h)], np.int32) for _ in range(nchan)]
    return ModularImage.from_planes(planes, depth)


def _roundtrip(img, **enc_kwargs):
    w = BitWriter()
    modular_encode(img, w, **enc_kwargs)
    w.align_to_byte()
    out = ModularImage(img.w, img.h, img.bitdepth, len(img.channel))
    for i, ch in enumerate(img.channel):
        out.channel[i] = Channel.create(ch.w, ch.h, ch.hshift, ch.vshift)
    r = BitReader(w.get_bytes())
    modular_decode(r, out)
    r.align_to_byte()
    r.close()
    return out, len(w.get_bytes())


@pytest.mark.parametrize("predictor", [P_ZERO, P_TOP, P_GRADIENT, P_SELECT,
                                       P_AVG4, P_WEIGHTED])
def test_modular_roundtrip_predictors(predictor):
    rng = random.Random(predictor)
    img = _rand_image(rng, 13, 9)
    out, _ = _roundtrip(img, predictor=predictor)
    for a, b in zip(img.channel, out.channel):
        np.testing.assert_array_equal(a.data, b.data)


def test_modular_roundtrip_smooth_image():
    # A smooth gradient image should compress much better than noise.
    y, x = np.mgrid[0:32, 0:32]
    planes = [(x + 2 * y).astype(np.int32), (x * 2).astype(np.int32),
              (y * 3).astype(np.int32)]
    img = ModularImage.from_planes(planes, 8)
    out, nbytes = _roundtrip(img, predictor=P_GRADIENT)
    for a, b in zip(img.channel, out.channel):
        np.testing.assert_array_equal(a.data, b.data)
    # ClampedGradient clamps monotone ramps (residual 1/pixel), so this
    # compresses to ~entropy(two-symbol) not zero; raw would be 3072 B.
    assert nbytes < 600


def test_modular_roundtrip_with_ma_tree():
    # Tree splitting on y (property 2): top half Zero, bottom half Gradient.
    rng = random.Random(5)
    img = _rand_image(rng, 8, 8, nchan=1)
    tree = build_fixed_tree_list([
        ("split", 2, 3),
        ("leaf", P_GRADIENT, 0, 1),  # y > 3
        ("leaf", P_ZERO, 0, 1),      # y <= 3
    ])
    out, _ = _roundtrip(img, tree=tree)
    np.testing.assert_array_equal(img.channel[0].data, out.channel[0].data)


def test_modular_roundtrip_wp_property_tree():
    rng = random.Random(6)
    img = _rand_image(rng, 11, 7, nchan=1)
    from libjxl_tpu.modular.tree import WP_PROP
    tree = build_fixed_tree_list([
        ("split", WP_PROP, 0),
        ("leaf", P_WEIGHTED, 0, 1),
        ("leaf", P_GRADIENT, 0, 1),
    ])
    out, _ = _roundtrip(img, tree=tree)
    np.testing.assert_array_equal(img.channel[0].data, out.channel[0].data)


def test_tree_roundtrip():
    tree = build_fixed_tree_list([
        ("split", 2, 10),
        ("split", 7, -3),
        ("leaf", P_GRADIENT, 5, 1),
        ("leaf", P_ZERO, 0, 4),
        ("leaf", P_WEIGHTED, -2, 1),
    ])
    w = BitWriter()
    encode_tree(tree, w)
    w.align_to_byte()
    got = decode_tree(BitReader(w.get_bytes()))
    assert len(got) == len(tree)
    for a, b in zip(tree, got):
        assert (a.property, a.splitval, a.predictor, a.predictor_offset,
                a.multiplier) == (b.property, b.splitval, b.predictor,
                                  b.predictor_offset, b.multiplier)


@pytest.mark.parametrize("rct_type", [0, 1, 6, 7, 13, 41])
def test_rct_roundtrip(rct_type):
    rng = random.Random(rct_type)
    img = _rand_image(rng, 7, 5)
    orig = [c.data.copy() for c in img.channel]
    fwd_rct(img, 0, rct_type)
    inv_rct(img, 0, rct_type)
    for a, b in zip(orig, img.channel):
        np.testing.assert_array_equal(a, b.data)


def test_smooth_tendency_vec_matches_scalar():
    rng = random.Random(9)
    for _ in range(500):
        b = rng.randrange(-300, 300)
        a = rng.randrange(-300, 300)
        n = rng.randrange(-300, 300)
        expect = smooth_tendency(b, a, n)
        got = int(_smooth_tendency_vec(np.array([b]), np.array([a]),
                                       np.array([n]))[0])
        assert got == expect, (b, a, n)


@pytest.mark.parametrize("shape", [(16, 16), (13, 9), (1, 7), (8, 1),
                                   (31, 17)])
def test_squeeze_roundtrip_raw(shape):
    rng = random.Random(shape[0])
    w, h = shape
    img = _rand_image(rng, w, h, nchan=3)
    orig = [c.data.copy() for c in img.channel]
    squeezes = []
    fwd_squeeze(img, squeezes)
    # apply inverse
    inv_squeeze(img, squeezes)
    assert len(img.channel) == 3
    for a, b in zip(orig, img.channel):
        np.testing.assert_array_equal(a, b.data)


def test_modular_roundtrip_with_squeeze_transform():
    rng = random.Random(11)
    img = _rand_image(rng, 16, 16, nchan=1)
    orig = img.channel[0].data.copy()
    t = Transform(id=TransformId.SQUEEZE, squeezes=[])
    out, _ = _roundtrip(img, transforms=[t], predictor=P_GRADIENT)
    np.testing.assert_array_equal(orig, out.channel[0].data)


def test_modular_roundtrip_with_rct_transform():
    rng = random.Random(12)
    img = _rand_image(rng, 9, 9, nchan=3)
    orig = [c.data.copy() for c in img.channel]
    t = Transform(id=TransformId.RCT, begin_c=0, rct_type=6)  # YCoCg
    out, _ = _roundtrip(img, transforms=[t], predictor=P_GRADIENT)
    for a, b in zip(orig, out.channel):
        np.testing.assert_array_equal(a, b.data)


def test_modular_16bit():
    rng = random.Random(13)
    img = _rand_image(rng, 6, 6, nchan=1, depth=16)
    out, _ = _roundtrip(img, predictor=P_WEIGHTED)
    np.testing.assert_array_equal(img.channel[0].data, out.channel[0].data)


def test_modular_negative_values():
    rng = random.Random(14)
    planes = [np.array([[rng.randrange(-1000, 1000) for _ in range(5)]
                        for _ in range(7)], np.int32)]
    img = ModularImage.from_planes(planes, 16)
    out, _ = _roundtrip(img, predictor=P_GRADIENT)
    np.testing.assert_array_equal(img.channel[0].data, out.channel[0].data)


class TestLossyModular:
    """Responsive (squeeze-quantized) modular mode
    (enc_modular.cc:980-1035)."""

    def _img(self):
        rng = np.random.default_rng(4)
        yy, xx = np.mgrid[0:200, 0:280]
        return np.clip(
            np.stack([128 + 80 * np.sin(yy / 31) * np.cos(xx / 23)] * 3,
                     -1) + rng.normal(0, 5, (200, 280, 3)),
            0, 255).astype(np.uint8)

    def test_rate_quality_and_interop(self):
        from libjxl_tpu.api.simple import decode, encode
        img = self._img()
        sizes = []
        for d in (1.0, 2.0, 4.0):
            data = encode(img, distance=d, modular=True)
            out = decode(data).pixels
            err = np.abs(out.astype(int) - img.astype(int))
            assert err.mean() < 2.5 * d + 4.0, (d, err.mean())
            sizes.append(len(data))
        assert sizes[0] > sizes[1] > sizes[2], sizes
        lossless = len(encode(img, lossless=True))
        assert sizes[0] < lossless / 3

    def test_ref_decodes_lossy_modular(self):
        from libjxl_tpu.api.simple import decode, encode
        from libjxl_tpu.extras import refjxl
        if not refjxl.available():
            import pytest
            pytest.skip("system libjxl unavailable")
        img = self._img()
        data = encode(img, distance=1.5, modular=True)
        ours = decode(data).pixels
        ref = refjxl.decode(data, dtype="uint8").pixels
        assert np.array_equal(ref, ours)


def test_avg_predictors_truncate_toward_zero():
    """C++ (left+top)/2 truncates toward zero; Python // floors — they
    differ on negative odd sums (context_predict.h:497). Signed DC
    planes exercise this constantly; the python fallback must match
    the native coder bit-for-bit."""
    from libjxl_tpu.modular.predict import (P_AVG0, P_AVG1, P_AVG2,
                                            P_AVG3, predict_one)
    # left=-3, top=0 -> (-3)/2 = -1 in C (floor would give -2).
    assert predict_one(P_AVG0, -3, 0, 0, 0, 0, 0, 0, 0) == -1
    assert predict_one(P_AVG1, -3, 0, 0, 0, 0, 0, 0, 0) == -1
    assert predict_one(P_AVG2, 0, -1, -0, -2, 0, 0, 0, 0) == -1
    assert predict_one(P_AVG3, 0, -5, 0, 0, 0, 0, 0, 0) == -2
    assert predict_one(P_AVG0, 3, 0, 0, 0, 0, 0, 0, 0) == 1


def test_vardct_aux_global_tree_backend_parity():
    """VarDCT aux streams (learned global tree) must serialize
    identically with and without the native tokenizer."""
    import os
    import numpy as np
    import libjxl_tpu.native.bindings as b
    from libjxl_tpu.api.simple import decode, encode
    rng = np.random.default_rng(7)
    img = np.clip(rng.normal(128, 40, (64, 64, 3)), 0, 255
                  ).astype(np.uint8)
    native = encode(img, distance=2.0, effort=6)
    os.environ["LIBJXL_TPU_NO_NATIVE"] = "1"
    b._lib, b._tried = None, False
    try:
        python = encode(img, distance=2.0, effort=6)
    finally:
        del os.environ["LIBJXL_TPU_NO_NATIVE"]
        b._lib, b._tried = None, False
    assert native == python
    decode(native)  # and it decodes
