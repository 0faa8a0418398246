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


def test_sharded_decode2_slim_feed():
    """Slim (v2) feed sharded over batch x space: int16 coefficients on
    the wire, weights/CfL/LLF reconstructed inside the shard_map."""
    import jax
    from jax.sharding import Mesh

    from libjxl_tpu.api.simple import decode, encode
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.frame.decode_frame import decode_frame
    from libjxl_tpu.frame.headers import read_codestream_headers
    from libjxl_tpu.parallel.sharded_decode import (
        batch_feeds2, make_sharded_decode2)

    rng = np.random.default_rng(5)
    H, W = 256, 1024  # 4 width shards, group aligned
    imgs, feeds = [], []
    for i in range(2):
        yy, xx = np.mgrid[0:H, 0:W]
        img = np.clip(np.stack([128 + 80 * np.sin(yy / (31 + i)),
                                128 + 70 * np.cos(xx / 23),
                                120 + 60 * np.sin((xx + yy) / 41)], -1)
                      + rng.normal(0, 8, (H, W, 3)),
                      0, 255).astype(np.uint8)
        imgs.append(img)
        data = encode(img, distance=1.0, effort=5)
        r = BitReader(data)
        meta = read_codestream_headers(r)
        feeds.append(decode_frame(r, meta, device="feed").feed)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("batch", "space"))
    args, class_keys = batch_feeds2(feeds, 4)
    lf = feeds[0]["lf"]
    fn, shardings = make_sharded_decode2(
        mesh, H, W, epf_iters=int(lf.epf_iters), gab=bool(lf.gab),
        class_keys=class_keys)
    out = np.asarray(fn(*[jax.device_put(a, s)
                          for a, s in zip(args, shardings)]))
    for i, img in enumerate(imgs):
        ref = decode(encode(img, distance=1.0, effort=5)).pixels
        got = out[i].transpose(1, 2, 0)
        d = np.abs(got.astype(int) - ref.astype(int))
        assert d.max() <= 1 and (d > 1).mean() == 0


def test_sharded_decode2_ragged_height():
    """Non-block-aligned image height: the shard step must crop the
    bottom block padding BEFORE filtering (edge pixels otherwise
    filter against padding and diverge from the host)."""
    import jax
    from jax.sharding import Mesh

    from libjxl_tpu.api.simple import decode, encode
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.frame.decode_frame import decode_frame
    from libjxl_tpu.frame.headers import read_codestream_headers
    from libjxl_tpu.parallel.sharded_decode import (
        batch_feeds2, make_sharded_decode2)

    rng = np.random.default_rng(5)
    H, W = 123, 512
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.clip(np.stack([128 + 80 * np.sin(yy / 31),
                            128 + 70 * np.cos(xx / 23),
                            120 + 60 * np.sin((xx + yy) / 41)], -1)
                  + rng.normal(0, 8, (H, W, 3)), 0, 255).astype(np.uint8)
    data = encode(img, distance=1.0, effort=5)
    r = BitReader(data)
    meta = read_codestream_headers(r)
    feed = decode_frame(r, meta, device="feed").feed
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2),
                ("batch", "space"))
    args, ck = batch_feeds2([feed], 2)
    lf = feed["lf"]
    fn, sh = make_sharded_decode2(
        mesh, H, W, epf_iters=int(lf.epf_iters), gab=bool(lf.gab),
        class_keys=ck)
    out = np.asarray(fn(*[jax.device_put(a, s)
                          for a, s in zip(args, sh)]))
    assert out.shape == (1, 3, H, W)
    ref = decode(data).pixels
    d = np.abs(out[0].transpose(1, 2, 0).astype(int) - ref.astype(int))
    assert d.max() <= 1


def test_batch_feeds2_rejects_mismatched_tables():
    from libjxl_tpu.parallel.sharded_decode import batch_feeds2

    from libjxl_tpu.api.simple import encode
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.frame.decode_frame import decode_frame
    from libjxl_tpu.frame.headers import read_codestream_headers

    rng = np.random.default_rng(1)
    img = np.clip(rng.normal(128, 30, (64, 256, 3)), 0,
                  255).astype(np.uint8)
    data = encode(img, distance=1.0, effort=3)
    feeds = []
    for _ in range(2):
        r = BitReader(data)
        meta = read_codestream_headers(r)
        feeds.append(decode_frame(r, meta, device="feed").feed)
    feeds[1]["tables8"] = feeds[1]["tables8"] * 1.5  # custom matrices
    with pytest.raises(ValueError, match="dequant tables"):
        batch_feeds2(feeds, 1)


class TestParallelRunner:
    """Pluggable runner seam (parallel_runner.h analogue) + thread-pool
    contention: shared-pool decodes must stay bit-exact (SURVEY §5.2)."""

    def _stream(self):
        import numpy as np
        from libjxl_tpu.api.simple import encode
        rng = np.random.default_rng(4)
        img = np.clip(rng.normal(128, 40, (600, 700, 3)), 0, 255
                      ).astype(np.uint8)
        return encode(img, distance=1.0, effort=5)

    def test_serial_runner_matches_threaded(self):
        import numpy as np
        from libjxl_tpu.api.simple import decode
        from libjxl_tpu.parallel.runner import (SerialRunner, ThreadRunner,
                                                set_runner)
        data = self._stream()
        try:
            set_runner(SerialRunner())
            serial = decode(data).pixels
            set_runner(ThreadRunner(8))
            threaded = decode(data).pixels
        finally:
            set_runner(None)
        np.testing.assert_array_equal(serial, threaded)

    def test_custom_runner_is_used(self):
        from libjxl_tpu.api.simple import decode
        from libjxl_tpu.parallel.runner import set_runner
        calls = []

        class Spy:
            num_workers = 1

            def run(self, fn, n):
                calls.append(n)
                for i in range(n):
                    fn(i)

        data = self._stream()
        try:
            set_runner(Spy())
            decode(data)
        finally:
            set_runner(None)
        assert calls, "custom runner was never invoked"

    def test_contended_shared_pool_bit_exact(self):
        """Many decodes sharing ONE runner pool from many caller
        threads: results must equal the serial decode (no cross-request
        state bleed in the native section decoders)."""
        import numpy as np
        from concurrent.futures import ThreadPoolExecutor
        from libjxl_tpu.api.simple import decode, encode
        from libjxl_tpu.parallel.runner import (SerialRunner, ThreadRunner,
                                                set_runner)
        rng = np.random.default_rng(9)
        streams = [encode(np.clip(rng.normal(100 + 20 * i, 40,
                                             (280, 600, 3)), 0, 255
                                  ).astype(np.uint8),
                          distance=1.0 + 0.5 * i, effort=5)
                   for i in range(3)]
        try:
            set_runner(SerialRunner())
            want = [decode(s).pixels for s in streams]
            set_runner(ThreadRunner(6))
            with ThreadPoolExecutor(max_workers=6) as callers:
                got = list(callers.map(
                    lambda s: decode(s).pixels, streams * 3))
        finally:
            set_runner(None)
        for i, g in enumerate(got):
            np.testing.assert_array_equal(g, want[i % 3])
