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
