"""Fused pallas EPF/gaborish kernel vs the jnp whole-frame oracle.

The pallas kernel (ops/epf_pallas.py) streams row strips with a 7-px
halo through VMEM; these tests run it in interpreter mode on CPU and
compare against ops/filters_tpu.py (itself bit-compared against the
numpy loop-filter oracle in test_filters_tpu.py). Tolerance is float
rounding only: backends contract FMAs differently.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from libjxl_tpu.ops.epf_pallas import apply_loop_filters_pallas  # noqa: E402
from libjxl_tpu.ops.filters_tpu import apply_loop_filters_tpu  # noqa: E402

TOL = 2e-6


def _case(seed, h, w):
    rng = np.random.default_rng(seed)
    img = rng.normal(0, 0.3, (3, h, w)).astype(np.float32)
    sig = rng.uniform(0.05, 1.5,
                      ((h + 7) // 8, (w + 7) // 8)).astype(np.float32)
    return img, sig


@pytest.mark.parametrize("epf_iters", [0, 1, 2, 3])
@pytest.mark.parametrize("gab", [True, False])
def test_matches_jnp_oracle(epf_iters, gab):
    if epf_iters == 0 and not gab:
        return
    img, sig = _case(3, 96, 200)
    a = np.asarray(apply_loop_filters_tpu(
        jax.numpy.asarray(img), jax.numpy.asarray(sig),
        epf_iters=epf_iters, gab=gab))
    b = np.asarray(apply_loop_filters_pallas(
        jax.numpy.asarray(img), jax.numpy.asarray(sig),
        epf_iters=epf_iters, gab=gab, interpret=True))
    assert np.abs(a - b).max() < TOL


def test_ragged_shape():
    img, sig = _case(5, 61, 117)
    a = np.asarray(apply_loop_filters_tpu(
        jax.numpy.asarray(img), jax.numpy.asarray(sig),
        epf_iters=3, gab=True))
    b = np.asarray(apply_loop_filters_pallas(
        jax.numpy.asarray(img), jax.numpy.asarray(sig),
        epf_iters=3, gab=True, interpret=True))
    assert np.abs(a - b).max() < TOL


def test_low_sigma_skip_blocks():
    """Blocks under MIN_SIGMA must pass through untouched (EPF skip)."""
    img, sig = _case(7, 64, 128)
    sig[2:4, 3:6] = -10.0  # below MIN_SIGMA (-3.905) -> EPF skip
    a = np.asarray(apply_loop_filters_tpu(
        jax.numpy.asarray(img), jax.numpy.asarray(sig),
        epf_iters=2, gab=False))
    b = np.asarray(apply_loop_filters_pallas(
        jax.numpy.asarray(img), jax.numpy.asarray(sig),
        epf_iters=2, gab=False, interpret=True))
    assert np.abs(a - b).max() < TOL
    np.testing.assert_array_equal(b[:, 16:32, 24:48], img[:, 16:32, 24:48])
