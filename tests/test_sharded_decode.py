"""Sharded multi-device decode vs the host oracle (8 virtual CPU
devices, conftest.py). Mirrors __graft_entry__.dryrun_multichip."""

import numpy as np
import pytest


def test_sharded_decode_matches_host():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as G
    G.dryrun_multichip(8)
