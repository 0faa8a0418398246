"""Event-driven decoder / queue encoder API tests
(reference: decode_test.cc / encode_test.cc basic flows)."""

import numpy as np
import pytest

from libjxl_tpu.api import encode
from libjxl_tpu.api.decoder import Decoder, Event
from libjxl_tpu.api.encoder import Encoder, FrameSettings


def _img(h=40, w=50):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([x % 256, y % 256, (x + y) % 256], -1).astype(np.uint8)


def test_decoder_events_whole_input():
    img = _img()
    data = encode(img, lossless=True)
    dec = Decoder()
    dec.set_input(data)
    dec.close_input()
    assert dec.process_input() == Event.BASIC_INFO
    assert dec.basic_info.xsize == 50 and dec.basic_info.ysize == 40
    assert dec.basic_info.uses_original_profile
    assert dec.process_input() == Event.COLOR_ENCODING
    assert dec.process_input() == Event.FRAME
    assert dec.process_input() == Event.FULL_IMAGE
    np.testing.assert_array_equal(dec.image, img)
    assert dec.process_input() == Event.SUCCESS


def test_decoder_chunked_input():
    img = _img()
    data = encode(img, distance=1.0)
    dec = Decoder(events={Event.BASIC_INFO, Event.FULL_IMAGE})
    dec.set_input(data[:10])
    status = dec.process_input()
    # 10 bytes may or may not contain full headers; feed the rest.
    seen = {status}
    dec.set_input(data[10:40])
    seen.add(dec.process_input())
    dec.set_input(data[40:])
    dec.close_input()
    while True:
        status = dec.process_input()
        seen.add(status)
        if status in (Event.SUCCESS, Event.ERROR):
            break
    assert Event.BASIC_INFO in seen
    assert Event.FULL_IMAGE in seen
    assert status == Event.SUCCESS
    assert dec.image.shape == img.shape


def test_decoder_container_input():
    img = _img()
    data = encode(img, lossless=True, container=True)
    dec = Decoder(events={Event.FULL_IMAGE})
    dec.set_input(data)
    dec.close_input()
    assert dec.process_input() == Event.FULL_IMAGE
    np.testing.assert_array_equal(dec.image, img)


def test_decoder_garbage_errors():
    dec = Decoder()
    dec.set_input(b"\x00" * 64)
    dec.close_input()
    assert dec.process_input() == Event.ERROR


def test_encoder_single_frame():
    img = _img()
    enc = Encoder()
    enc.add_image_frame(img, FrameSettings(lossless=True))
    data = enc.process_output()
    from libjxl_tpu.api import decode
    np.testing.assert_array_equal(decode(data).pixels, img)


def test_encoder_with_boxes():
    img = _img()
    enc = Encoder()
    enc.add_image_frame(img, FrameSettings(distance=2.0))
    enc.add_box(b"Exif", b"\x00\x00\x00\x00MM\x00\x2a")
    data = enc.process_output()
    from libjxl_tpu.container.boxes import unpack_container
    content = unpack_container(data)
    assert content.exif is not None


def test_encoder_animation():
    frames = [_img(), _img() + 10]
    enc = Encoder(animation_tps=(24, 1))
    for f in frames:
        enc.add_image_frame(f, FrameSettings(lossless=True, duration=2))
    data = enc.process_output()
    from libjxl_tpu.api import decode_all
    out, meta = decode_all(data)
    assert len(out) == 2 and meta.m.animation.tps_numerator == 24


def test_encoder_settings_effort_and_resampling():
    img = _img(64, 72)
    enc = Encoder()
    enc.add_image_frame(img, FrameSettings(distance=1.0, resampling=2))
    data = enc.process_output()
    from libjxl_tpu.api import decode
    res = decode(data)
    assert res.pixels.shape == img.shape


def test_incremental_sections_decoded_once():
    """Byte-by-byte feed is O(n): every section decodes exactly once
    (dec_frame.cc:571-600 section dedup/resume)."""
    import libjxl_tpu.frame.incremental as inc_mod
    img = _img(128, 128)
    data = encode(img, distance=1.0, effort=3)
    from libjxl_tpu.api.simple import decode as _decode
    ref = _decode(data).pixels

    calls = {"lf": 0, "dc": 0, "acg": 0, "ac": 0}
    orig = (inc_mod.IncrementalFrameDecoder._decode_lf_global,
            inc_mod.IncrementalFrameDecoder._decode_dc_group,
            inc_mod.IncrementalFrameDecoder._decode_ac_global,
            inc_mod.IncrementalFrameDecoder._decode_ac_group)

    def wrap(name, fn):
        def inner(self, *a, **k):
            calls[name] += 1
            return fn(self, *a, **k)
        return inner

    inc_mod.IncrementalFrameDecoder._decode_lf_global = wrap("lf", orig[0])
    inc_mod.IncrementalFrameDecoder._decode_dc_group = wrap("dc", orig[1])
    inc_mod.IncrementalFrameDecoder._decode_ac_global = wrap("acg", orig[2])
    inc_mod.IncrementalFrameDecoder._decode_ac_group = wrap("ac", orig[3])
    try:
        dec = Decoder(events={Event.FULL_IMAGE})
        status = Event.NEED_MORE_INPUT
        step = 97  # prime-sized chunks
        for i in range(0, len(data), step):
            dec.set_input(data[i:i + step])
            status = dec.process_input()
            if status in (Event.FULL_IMAGE, Event.SUCCESS, Event.ERROR):
                break
        dec.close_input()
        while status not in (Event.SUCCESS, Event.ERROR):
            status = dec.process_input()
        assert status == Event.SUCCESS
    finally:
        (inc_mod.IncrementalFrameDecoder._decode_lf_global,
         inc_mod.IncrementalFrameDecoder._decode_dc_group,
         inc_mod.IncrementalFrameDecoder._decode_ac_global,
         inc_mod.IncrementalFrameDecoder._decode_ac_group) = orig
    assert np.array_equal(dec.image, ref)
    assert calls["lf"] == 1 and calls["acg"] == 1
    assert calls["dc"] == 1           # one DC group for 128x128
    assert calls["ac"] == 1           # one AC group x one pass


def test_progressive_flush_partial_image():
    """A truncated progressive stream flushes to a viewable partial
    image once DC + AC-global have arrived."""
    rng = np.random.default_rng(3)
    base = np.outer(np.sin(np.linspace(0, 9, 256)),
                    np.cos(np.linspace(0, 7, 256)))[..., None] * 100 + 128
    img = np.clip(base + rng.normal(0, 12, (256, 256, 3)), 0, 255
                  ).astype(np.uint8)
    data = encode(img, distance=1.0, effort=3, progressive=True)
    dec = Decoder(events={Event.FULL_IMAGE, Event.FRAME_PROGRESSION})
    status = Event.NEED_MORE_INPUT
    partial = None
    fed = 0
    step = max(1, len(data) // 50)
    while fed < len(data):
        dec.set_input(data[fed:fed + step])
        fed += step
        status = dec.process_input()
        partial = dec.flush_image()
        if partial is not None:
            break
    assert partial is not None
    assert fed < len(data)            # flushed before the full stream
    assert partial.shape == (256, 256, 3)
    dec.set_input(data[fed:])
    dec.close_input()
    while status not in (Event.SUCCESS, Event.ERROR):
        status = dec.process_input()
    assert status == Event.SUCCESS
    err = np.abs(partial.astype(int) - dec.image.astype(int)).mean()
    assert err < 24, err


def test_rewind_and_skip_frames():
    frames = [np.full((32, 32, 3), v, np.uint8) for v in (40, 120, 220)]
    from libjxl_tpu.api.simple import encode_animation
    data = encode_animation(frames, lossless=True)
    dec = Decoder(events={Event.FULL_IMAGE})
    dec.set_input(data)
    dec.close_input()
    imgs = []
    while True:
        ev = dec.process_input()
        if ev == Event.FULL_IMAGE:
            imgs.append(dec.image.copy())
        elif ev in (Event.SUCCESS, Event.ERROR):
            break
    assert ev == Event.SUCCESS and len(imgs) == 3
    # rewind: re-iterate from the first frame
    dec.rewind()
    ev = dec.process_input()
    assert ev == Event.FULL_IMAGE
    assert np.array_equal(dec.image, imgs[0])
    # skip one frame: next decoded frame is the third
    dec.skip_frames(1)
    ev = dec.process_input()
    assert ev == Event.FULL_IMAGE
    assert np.array_equal(dec.image, imgs[2])


class TestStreamingEncode:
    """Chunked (bounded-memory) encoding — enc_frame.cc:2047
    EncodeFrameStreaming + ComputePermutationForStreaming."""

    def _image(self, h, w, seed=3):
        rng = np.random.default_rng(seed)
        base = np.outer(np.sin(np.linspace(0, 9, h)),
                        np.cos(np.linspace(0, 21, w)))[..., None] * 100 + 128
        return np.clip(base + rng.normal(0, 10, (h, w, 3)),
                       0, 255).astype(np.uint8)

    def test_multi_chunk_roundtrip(self):
        from libjxl_tpu.api.simple import decode, encode_streaming
        img = self._image(300, 2500)  # 2 DC-group chunks side by side
        calls = []

        def chunk(x0, y0, w, h):
            calls.append((x0, y0, w, h))
            return img[y0:y0 + h, x0:x0 + w]

        data = encode_streaming(chunk, 2500, 300, distance=1.0)
        # Bounded memory: exactly one call per DC-group chunk.
        assert calls == [(0, 0, 2048, 300), (2048, 0, 452, 300)]
        out = decode(data).pixels
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() < 64
        assert np.sqrt((err.astype(float) ** 2).mean()) < 12

    def test_single_chunk_roundtrip(self):
        from libjxl_tpu.api.simple import decode, encode_streaming
        img = self._image(64, 96, seed=9)
        data = encode_streaming(lambda x0, y0, w, h:
                                img[y0:y0 + h, x0:x0 + w],
                                96, 64, distance=1.0)
        out = decode(data).pixels
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() < 64

    def test_toc_permutation_roundtrip(self):
        from libjxl_tpu.base.frame_dimensions import FrameDimensions
        from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
        from libjxl_tpu.bitstream.toc import read_toc, write_toc
        from libjxl_tpu.frame.streaming_encode import streaming_permutation
        fd = FrameDimensions.make(2500, 300)
        perm = streaming_permutation(fd)
        n = 2 + fd.num_dc_groups + fd.num_groups
        assert sorted(perm) == list(range(n))
        # ACGlobal is the last section in the stream.
        assert perm[1 + fd.num_dc_groups] == n - 1
        sizes_canonical = [10 + 3 * i for i in range(n)]
        stream_order = [0] * n
        for old, new in enumerate(perm):
            stream_order[new] = old
        sizes_stream = [sizes_canonical[old] for old in stream_order]
        w = BitWriter()
        write_toc(sizes_stream, w, permutation=perm)
        w.align_to_byte()
        r = BitReader(w.get_bytes())
        sizes, offsets = read_toc(n, r)
        assert list(sizes) == sizes_canonical

    def test_ref_decodes_streamed_output(self):
        from libjxl_tpu.api.simple import decode, encode_streaming
        from libjxl_tpu.extras import refjxl
        if not refjxl.available():
            import pytest
            pytest.skip("system libjxl unavailable")
        img = self._image(300, 2500)
        data = encode_streaming(lambda x0, y0, w, h:
                                img[y0:y0 + h, x0:x0 + w],
                                2500, 300, distance=1.0)
        ours = decode(data).pixels
        ref = refjxl.decode(data, dtype="uint8").pixels
        d = np.abs(ref.astype(int) - ours.astype(int))
        assert (d > 2).sum() == 0


class TestEncoderStatsAndSettings:
    """enc_aux_out.h AuxOut / include/jxl/stats.h JxlEncoderStats and
    the JxlEncoderFrameSettingId option surface (encode.h:1312)."""

    def test_stats_account_every_bit(self):
        from libjxl_tpu.api.encoder import Encoder
        rng = np.random.default_rng(0)
        img = np.clip(rng.normal(128, 40, (120, 160, 3)),
                      0, 255).astype(np.uint8)
        enc = Encoder(collect_stats=True)
        enc.add_image_frame(img)
        data = enc.process_output()
        st = enc.stats()
        assert st["total_bits"] == len(data) * 8 - (-st["total_bits"] % 8) \
            or abs(st["total_bits"] - len(data) * 8) < 64
        assert st["layers_bits"]["ac_tokens"] > 0
        assert st["layers_bits"]["dc"] > 0
        assert st["layers_bits"]["header"] > 0
        assert st["num_blocks"] > 0
        assert 0 < st["bpp"] < 24

    def test_frame_setting_ids(self):
        from libjxl_tpu.api.encoder import FrameSettingId, FrameSettings
        fs = FrameSettings()
        fs.set_option(FrameSettingId.EFFORT, 3)
        assert fs.effort == 3
        fs.set_option(FrameSettingId.RESAMPLING, 2)
        assert fs.resampling == 2
        fs.set_option(FrameSettingId.PHOTON_NOISE, 800)
        assert fs.photon_noise_iso == 800
        fs.set_option(FrameSettingId.PATCHES, 0)
        assert fs.patches is False
        fs.set_option(FrameSettingId.BROTLI_EFFORT, 9)  # recorded
        assert fs.options[FrameSettingId.BROTLI_EFFORT] == 9
        with pytest.raises(ValueError):
            fs.set_option(FrameSettingId.EFFORT, 11)
        fs.set_distance(0.0)
        assert fs.lossless
        with pytest.raises(ValueError):
            fs.set_distance(26.0)
        # All 37 ids exist, mirroring the C enum.
        assert len(FrameSettingId) == 41   # ids 0..40, encode.h:132-418

    def test_stats_lossless(self):
        from libjxl_tpu.api.encoder import Encoder, FrameSettings
        img = _img()
        enc = Encoder(collect_stats=True)
        enc.add_image_frame(img, FrameSettings(lossless=True))
        data = enc.process_output()
        st = enc.stats()
        assert st["layers_bits"]["modular_global"] > 0


def test_center_first_group_order():
    """ComputePermutationForCenterFirst (enc_frame.cc:1725): the TOC
    permutation reorders AC groups center-out; pixels are unchanged."""
    from libjxl_tpu.api.simple import decode, encode
    rng = np.random.default_rng(2)
    img = np.clip(rng.normal(128, 40, (600, 800, 3)),
                  0, 255).astype(np.uint8)
    base = decode(encode(img, distance=1.0, effort=4)).pixels
    for go in (True, (100, 50)):
        data = encode(img, distance=1.0, effort=4, group_order=go)
        np.testing.assert_array_equal(decode(data).pixels, base)


def test_center_first_permutation_shape():
    from libjxl_tpu.base.frame_dimensions import FrameDimensions
    from libjxl_tpu.frame.encode_frame import _center_first_permutation
    fd = FrameDimensions.make(800, 600)
    perm = _center_first_permutation(fd, 1)
    n = 2 + fd.num_dc_groups + fd.num_groups
    assert sorted(perm) == list(range(n))
    # The first AC group in the stream is the central one.
    first_stream_ac = perm.index(2 + fd.num_dc_groups, 0)  # noqa: unused
    order = [0] * fd.num_groups
    for g in range(fd.num_groups):
        order[perm[2 + fd.num_dc_groups + g] - 2 - fd.num_dc_groups] = g
    center_g = order[0]
    gy, gx = divmod(center_g, fd.xsize_groups)
    assert abs(gx - fd.xsize_groups // 2) <= 1
    assert abs(gy - fd.ysize_groups // 2) <= 1


def test_decoder_box_event():
    """JXL_DEC_BOX: container metadata boxes surface as events."""
    img = _img()
    enc = Encoder()
    enc.add_image_frame(img, FrameSettings(lossless=True))
    enc.add_box(b"Exif", b"\x00\x00\x00\x00MM\x00\x2aXX")
    data = enc.process_output()
    dec = Decoder(events={Event.BOX, Event.FULL_IMAGE})
    dec.set_input(data)
    dec.close_input()
    seen = []
    for _ in range(8):
        ev = dec.process_input()
        seen.append(ev)
        if ev == Event.BOX:
            assert dec.box_type == b"Exif"
            assert dec.box_contents.endswith(b"XX")
        if ev in (Event.SUCCESS, Event.ERROR):
            break
    assert Event.BOX in seen and seen[-1] == Event.SUCCESS


def test_decoder_jpeg_reconstruction_event():
    """JXL_DEC_JPEG_RECONSTRUCTION: byte-exact JPEG re-emission."""
    import io

    from PIL import Image

    from libjxl_tpu.extras.jpeg_transcode import transcode_jpeg_container
    img = _img(48, 64)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    jpg = buf.getvalue()
    jxl = transcode_jpeg_container(jpg)
    dec = Decoder(events={Event.JPEG_RECONSTRUCTION, Event.FULL_IMAGE})
    dec.set_input(jxl)
    dec.close_input()
    got = None
    for _ in range(8):
        ev = dec.process_input()
        if ev == Event.JPEG_RECONSTRUCTION:
            got = dec.jpeg_bytes
        if ev in (Event.SUCCESS, Event.ERROR):
            assert ev == Event.SUCCESS
            break
    assert got == jpg


def test_incremental_modular_sections_decoded_once():
    """Modular (lossless) frames in the incremental profile: byte-by-
    byte feed decodes each modular section exactly once (O(n)), and the
    result is bit-exact."""
    import libjxl_tpu.frame.incremental as inc_mod
    img = _img(300, 300)   # 4 AC groups
    data = encode(img, lossless=True, effort=3)

    calls = {"lf": 0, "dc": 0, "ac": 0}
    orig = (inc_mod.IncrementalFrameDecoder._decode_lf_global,
            inc_mod.IncrementalFrameDecoder._decode_dc_group,
            inc_mod.IncrementalFrameDecoder._decode_ac_group)

    def wrap(name, fn):
        def inner(self, *a, **k):
            calls[name] += 1
            return fn(self, *a, **k)
        return inner

    inc_mod.IncrementalFrameDecoder._decode_lf_global = wrap("lf", orig[0])
    inc_mod.IncrementalFrameDecoder._decode_dc_group = wrap("dc", orig[1])
    inc_mod.IncrementalFrameDecoder._decode_ac_group = wrap("ac", orig[2])
    try:
        dec = Decoder(events={Event.FULL_IMAGE})
        status = Event.NEED_MORE_INPUT
        step = 211
        for i in range(0, len(data), step):
            dec.set_input(data[i:i + step])
            status = dec.process_input()
            if status in (Event.FULL_IMAGE, Event.SUCCESS, Event.ERROR):
                break
        dec.close_input()
        while status not in (Event.SUCCESS, Event.ERROR):
            status = dec.process_input()
        assert status == Event.SUCCESS
    finally:
        (inc_mod.IncrementalFrameDecoder._decode_lf_global,
         inc_mod.IncrementalFrameDecoder._decode_dc_group,
         inc_mod.IncrementalFrameDecoder._decode_ac_group) = orig
    assert np.array_equal(dec.image, img)
    assert calls["lf"] == 1
    assert calls["dc"] == 1
    assert calls["ac"] == 4           # 2x2 AC groups, one pass


def test_incremental_animation_byte_by_byte():
    """An animation fed byte-by-byte decodes every frame with per-frame
    delivery (VERDICT item 8: multi-frame section resume)."""
    from libjxl_tpu.api.simple import encode_animation
    rng = np.random.default_rng(4)
    frames = [np.clip(_img(96, 96).astype(int)
                      + rng.integers(-20, 20, (96, 96, 3)), 0,
                      255).astype(np.uint8) for _ in range(3)]
    data = encode_animation(frames, durations=[1, 1, 1], distance=1.0)

    dec = Decoder(events={Event.FULL_IMAGE})
    got = []
    status = Event.NEED_MORE_INPUT
    step = 499
    i = 0
    while i < len(data) or status not in (Event.SUCCESS, Event.ERROR):
        if status == Event.NEED_MORE_INPUT and i < len(data):
            dec.set_input(data[i:i + step])
            i += step
            if i >= len(data):
                dec.close_input()
        status = dec.process_input()
        if status == Event.FULL_IMAGE:
            got.append(dec.image.copy())
    assert status == Event.SUCCESS
    assert len(got) == 3
    from libjxl_tpu.api import decode_all
    refs, _ = decode_all(data)
    for g, r in zip(got, refs):
        assert np.abs(g.astype(int) - r.pixels.astype(int)).max() <= 1


def test_preferred_output_profile_and_callback():
    """decode.h:1021 preferred color profile + decode.h:1152 image-out
    callback: linear output = inverse sRGB TF of the default output;
    the callback receives every row of the final image."""
    from libjxl_tpu.color.xyb import srgb_to_linear
    img = _img(32, 48)
    data = encode(img, distance=1.0)

    dec = Decoder(events={Event.FULL_IMAGE})
    dec.set_input(data)
    dec.close_input()
    assert dec.process_input() == Event.FULL_IMAGE
    default = dec.image.astype(np.float64) / 255.0

    dec2 = Decoder(events={Event.FULL_IMAGE})
    dec2.set_preferred_color_profile("linear")
    rows = []
    dec2.set_image_out_callback(
        lambda x, y, n, row: rows.append((y, row.copy())))
    dec2.set_input(data)
    dec2.close_input()
    assert dec2.process_input() == Event.FULL_IMAGE
    lin = dec2.image.astype(np.float64) / 255.0
    expect = srgb_to_linear(default.transpose(2, 0, 1)).transpose(1, 2, 0)
    assert np.abs(lin - expect).max() < 2.5 / 255.0
    assert len(rows) == 32
    assert all(np.array_equal(r, dec2.image[y]) for y, r in rows)

    with pytest.raises(ValueError):
        dec2.set_preferred_color_profile("bogus")
