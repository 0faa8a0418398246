"""Device (TPU pipeline) decode vs host oracle.

Runs on the virtual CPU backend in tests; the driver benches the same
code on real TPU. The device path must match the host decode to within
1 intensity level (f32 vs f64 rounding) across strategies, filters, and
CfL configurations.
"""

import numpy as np
import pytest

from libjxl_tpu.api import simple


def _img(h=96, w=96, seed=3):
    rng = np.random.default_rng(seed)
    base = np.clip(
        np.outer(np.sin(np.linspace(0, 9, h)), np.cos(np.linspace(0, 7, w)))
        [..., None] * 120 + 128 + rng.normal(0, 8, (h, w, 1)), 0, 255)
    img = np.repeat(base, 3, axis=2).astype(np.uint8)
    img[:, :, 1] = np.roll(img[:, :, 1], 5, axis=1)
    return img


def _check(data, tol=1):
    host = simple.decode(data).pixels
    dev = simple.decode(data, device=True).pixels
    err = int(np.abs(host.astype(np.int64) - dev.astype(np.int64)).max())
    assert err <= tol, f"device-vs-host maxerr {err}"


@pytest.mark.parametrize("effort", [1, 3, 5, 7])
def test_device_matches_host_own_encoder(effort):
    _check(simple.encode(_img(), distance=1.0, effort=effort))


@pytest.mark.parametrize("distance", [0.5, 2.0, 4.0])
def test_device_matches_host_distances(distance):
    _check(simple.encode(_img(), distance=distance, effort=5))


def test_device_matches_host_odd_size():
    img = np.ascontiguousarray(_img(120, 200)[:117, :193])
    _check(simple.encode(img, distance=1.0, effort=5))


def test_device_matches_host_ref_streams():
    refjxl = pytest.importorskip("libjxl_tpu.extras.refjxl")
    if not refjxl.available():
        pytest.skip("system libjxl not installed")
    img = _img()
    for eff in (3, 7):
        data = refjxl.encode(img, distance=1.0, effort=eff)
        _check(data)
    # big-ACS content
    smooth = (np.outer(np.sin(np.linspace(0, 5, 128)),
                       np.cos(np.linspace(0, 4, 128)))[..., None]
              * [110, 120, 100] + 128).astype(np.uint8)
    _check(refjxl.encode(smooth, distance=1.0, effort=7))


def test_batched_device_decode_matches_host():
    """decode_frames_device_batched: one vmapped dispatch over N frames
    matches the per-frame host decode."""
    import numpy as np
    from libjxl_tpu.api.simple import decode, encode
    from libjxl_tpu.tpu.batch_decode import parse_to_feed
    from libjxl_tpu.tpu.pipeline import decode_frames_device_batched

    rng = np.random.default_rng(3)
    streams = []
    for i in range(3):
        y, x = np.mgrid[0:200, 0:304]
        img = np.stack(
            [np.clip(0.5 + 0.3 * np.sin(x / (11 + 2 * i) + c)
                     * np.cos(y / 17) + rng.normal(0, 0.02, (200, 304)),
                     0, 1) for c in range(3)], axis=-1)
        streams.append(encode((img * 255).astype(np.uint8),
                              distance=1.0, effort=5))
    feeds = [parse_to_feed(s) for s in streams]
    outs = decode_frames_device_batched(feeds, 200, 304, out="srgb8")
    for o, s in zip(outs, streams):
        ref = decode(s).pixels
        got = np.asarray(o)
        if got.shape != ref.shape:
            got = got.transpose(1, 2, 0)
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
