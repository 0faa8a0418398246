"""Device-path consistency: JAX fused ops vs numpy reference, plus
multi-chip sharding on the virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_decode_groups_matches_numpy_reference():
    from libjxl_tpu.ops.decode_tpu import decode_groups_dct8, example_inputs
    from libjxl_tpu.vardct.quantizer import adjust_quant_bias
    from libjxl_tpu.vardct.dct import idct_matrix

    args = example_inputs(num_groups=2, blocks=4, seed=3)
    coeffs, dc, raw_quant, table, inv_gs, ytox, ytob, qm_mul, biases = args
    got = np.asarray(decode_groups_dct8(*[np.asarray(a) for a in args]))

    # numpy reference
    g, _, by, bx, _ = coeffs.shape
    expect = np.zeros_like(got)
    i8 = idct_matrix(8)
    for gi in range(g):
        for y in range(by):
            for x in range(bx):
                scale = inv_gs / raw_quant[gi, y, x]
                dq = adjust_quant_bias(coeffs[gi, :, y, x]) \
                    * table * scale * qm_mul[:, None]
                dq[0] += ytox[gi, y, x] * dq[1]
                dq[2] += ytob[gi, y, x] * dq[1]
                dq[:, 0] = dc[gi, :, y, x]
                for c in range(3):
                    pix = i8 @ dq[c].reshape(8, 8) @ i8.T
                    expect[gi, c, y * 8:y * 8 + 8, x * 8:x * 8 + 8] = pix
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_xyb_roundtrip_device_vs_numpy():
    from libjxl_tpu.ops.encode_pipeline import srgb_to_xyb
    from libjxl_tpu.ops.decode_tpu import xyb_to_srgb8
    from libjxl_tpu.color.xyb import (
        linear_rgb_to_xyb, srgb_to_linear)

    rng = np.random.default_rng(5)
    srgb = rng.random((3, 16, 16), np.float32)
    xyb_dev = np.asarray(srgb_to_xyb(srgb))
    xyb_np = linear_rgb_to_xyb(srgb_to_linear(srgb))
    np.testing.assert_allclose(xyb_dev, xyb_np, atol=1e-5)

    back = np.asarray(xyb_to_srgb8(xyb_dev))
    expect = np.clip(np.round(srgb * 255), 0, 255)
    assert np.abs(back.astype(int) - expect.astype(int)).max() <= 1


def test_graft_entry_compiles():
    import jax
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (3, 128, 128)
    assert out.dtype == np.uint8


def test_xyb_to_pq16_matches_host_reference():
    """Device PQ output stage (ops/decode_tpu.py xyb_to_pq16) vs the
    host xyb_to_linear_rgb + PQ inverse-EOTF composition (lib/jxl/cms/
    transfer_functions-inl.h TF_PQ)."""
    import numpy as np
    import jax.numpy as jnp
    from libjxl_tpu.ops.decode_tpu import xyb_to_pq16
    from libjxl_tpu.color.xyb import xyb_to_linear_rgb
    from libjxl_tpu.color.transfer_functions import pq_encoded_from_display

    rng = np.random.default_rng(11)
    xyb = np.stack([rng.uniform(-0.02, 0.03, (33, 47)),
                    rng.uniform(0.0, 0.8, (33, 47)),
                    rng.uniform(0.0, 0.9, (33, 47))]).astype(np.float32)
    got = np.asarray(xyb_to_pq16(jnp.asarray(xyb)))
    lin = xyb_to_linear_rgb(xyb).astype(np.float64)
    d = np.clip(lin * (255.0 / 10000.0), 0.0, 1.0)
    want = np.round(np.clip(pq_encoded_from_display(d, 10000.0), 0, 1)
                    * 65535.0)
    assert np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 1
