"""Device (JAX) loop filters vs the numpy oracle."""

import numpy as np
import pytest

from libjxl_tpu.frame.frame_header import LoopFilter
from libjxl_tpu.pipeline.loop_filters import (
    compute_sigma_map, epf1, epf2, gaborish,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    img = rng.normal(0.5, 0.2, (3, 64, 80)).astype(np.float32)
    lf = LoopFilter()
    raw_quant = rng.integers(100, 6000, (8, 10))
    sharpness = rng.integers(0, 8, (8, 10))
    inv_sigma = compute_sigma_map(lf, raw_quant, sharpness, 0.0002)
    return img, lf, inv_sigma.astype(np.float32)


def test_gaborish_matches(setup):
    img, lf, _ = setup
    from libjxl_tpu.ops.filters_tpu import gaborish_tpu
    ref = gaborish(img, lf)
    got = np.asarray(gaborish_tpu(
        img, [(lf.gab_x_weight1, lf.gab_x_weight2),
              (lf.gab_y_weight1, lf.gab_y_weight2),
              (lf.gab_b_weight1, lf.gab_b_weight2)]))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_epf_chain_matches(setup):
    img, lf, inv_sigma = setup
    from libjxl_tpu.ops.filters_tpu import apply_loop_filters_tpu
    ref = epf2(epf1(gaborish(img, lf), lf, inv_sigma), lf, inv_sigma)
    got = np.asarray(apply_loop_filters_tpu(
        img, inv_sigma, epf_iters=2, gab=True,
        gab_weights=[(lf.gab_x_weight1, lf.gab_x_weight2),
                     (lf.gab_y_weight1, lf.gab_y_weight2),
                     (lf.gab_b_weight1, lf.gab_b_weight2)]))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_jittable(setup):
    import jax
    img, lf, inv_sigma = setup
    from libjxl_tpu.ops.filters_tpu import apply_loop_filters_tpu
    fn = jax.jit(lambda a, s: apply_loop_filters_tpu(a, s))
    out = np.asarray(fn(img, inv_sigma))
    assert out.shape == img.shape and np.isfinite(out).all()
