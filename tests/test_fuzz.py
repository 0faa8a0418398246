"""Fuzz harness: mutated/random inputs must raise JxlError (or decode),
never crash with an unrelated exception.

Mirrors the reference's libFuzzer targets (tools/djxl_fuzzer.cc,
decode_basic_info_fuzzer, icc_codec_fuzzer, rans_fuzzer, fields_fuzzer,
set_from_bytes_fuzzer) using Hypothesis byte mutation plus seeded
deterministic corpora. Any exception type other than JxlError escaping
a parser entry point is a bug — the reference hardens every read the
same way (SURVEY.md §4.4).
"""

import os
import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from libjxl_tpu.base.errors import JxlError


def _check(fn, data):
    try:
        fn(data)
    except JxlError:
        pass
    # Any other exception propagates and fails the test.


_SETTINGS = dict(max_examples=120, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


# ---------------------------------------------------------------------------
# Entry points under fuzz

def _decode(data):
    from libjxl_tpu.api.simple import decode
    decode(bytes(data))


def _decode_all(data):
    from libjxl_tpu.api.simple import decode_all
    decode_all(bytes(data))


def _container(data):
    from libjxl_tpu.container.boxes import unpack_container
    unpack_container(bytes(data))


def _headers(data):
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.frame.headers import read_codestream_headers
    read_codestream_headers(BitReader(bytes(data)))


def _icc(data):
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.color.icc_codec import read_icc
    read_icc(BitReader(bytes(data)))


def _histograms(data):
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.entropy.codes import decode_histograms
    decode_histograms(BitReader(bytes(data)), 16)


def _modular(data):
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.modular.codec import modular_decode
    from libjxl_tpu.modular.image import ModularImage
    img = ModularImage(16, 16, 8, 3)
    modular_decode(BitReader(bytes(data)), img, 0, undo_transforms=True)


def _jbrd(data):
    from libjxl_tpu.extras.jbrd import decode_jbrd
    decode_jbrd(bytes(data))


def _jpeg(data):
    from libjxl_tpu.extras.jpeg_parser import parse_jpeg
    parse_jpeg(bytes(data))


def _streaming(data):
    from libjxl_tpu.api.decoder import Decoder, Event
    dec = Decoder()
    data = bytes(data)
    for i in range(0, len(data), 37):
        dec.set_input(data[i:i + 37])
        for _ in range(4):
            ev = dec.process_input()
            if ev in (Event.SUCCESS, Event.ERROR):
                return
    dec.close_input()
    for _ in range(16):
        ev = dec.process_input()
        if ev in (Event.SUCCESS, Event.ERROR):
            return


ENTRY_POINTS = {
    "decode": _decode,
    "decode_all": _decode_all,
    "container": _container,
    "headers": _headers,
    "icc": _icc,
    "histograms": _histograms,
    "modular": _modular,
    "jbrd": _jbrd,
    "jpeg": _jpeg,
    "streaming": _streaming,
}


@pytest.mark.parametrize("name", sorted(ENTRY_POINTS))
@settings(**_SETTINGS)
@given(data=st.binary(min_size=0, max_size=256))
def test_random_bytes(name, data):
    _check(ENTRY_POINTS[name], data)


def _valid_stream():
    from libjxl_tpu.api.simple import encode
    rng = np.random.default_rng(11)
    img = np.clip(rng.normal(128, 40, (40, 56, 3)), 0, 255).astype(np.uint8)
    return encode(img, distance=1.0, effort=3)


@pytest.mark.parametrize("name", ["decode", "streaming", "container"])
@settings(max_examples=80, deadline=None)
@given(pos=st.integers(0, 10_000), val=st.integers(0, 255),
       cut=st.integers(0, 10_000))
def test_mutated_valid_stream(name, pos, val, cut):
    """Bit flips + truncations of a real stream (djxl_fuzzer corpus
    style)."""
    base = _valid_stream()
    data = bytearray(base)
    data[pos % len(data)] = val
    data = bytes(data[:1 + cut % len(data)])
    _check(ENTRY_POINTS[name], data)


def test_seeded_mutation_sweep():
    """Deterministic wide sweep: every byte position flipped once
    (replayed 'crash corpus' equivalent; fast because decode fails
    early for most flips)."""
    base = _valid_stream()
    from libjxl_tpu.api.simple import decode
    for pos in range(len(base)):
        data = bytearray(base)
        data[pos] ^= 0xA5
        try:
            decode(bytes(data))
        except JxlError:
            pass


def test_truncation_sweep():
    base = _valid_stream()
    from libjxl_tpu.api.simple import decode
    for cut in range(0, len(base), 3):
        try:
            decode(base[:cut])
        except JxlError:
            pass


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_shuffled_section_order_bit_exact(seed):
    """FakeParallelRunner analogue (fake_parallel_runner_testonly.h):
    decode a multi-group frame's sections in seed-shuffled order and
    bit-compare against in-order decoding — sections must be fully
    independent."""
    import random

    from libjxl_tpu.api.simple import decode, encode
    from libjxl_tpu.bitstream.bit_io import BitReader
    from libjxl_tpu.container.boxes import is_container
    from libjxl_tpu.frame.headers import read_codestream_headers
    from libjxl_tpu.frame.incremental import IncrementalFrameDecoder

    rng = np.random.default_rng(3)
    img = np.clip(rng.normal(128, 40, (300, 520, 3)), 0, 255
                  ).astype(np.uint8)
    data = encode(img, distance=1.0, effort=3)
    # The reference must use the same numpy color tail the incremental
    # comparison below uses (the fused native XYB->sRGB tail may differ
    # by 1 LSB at exact rounding boundaries).
    os.environ["LIBJXL_TPU_NO_NATIVE_COLOR"] = "1"
    try:
        ref = decode(data).pixels
    finally:
        del os.environ["LIBJXL_TPU_NO_NATIVE_COLOR"]

    r = BitReader(data)
    meta = read_codestream_headers(r)
    inc = IncrementalFrameDecoder(meta)
    assert inc.init(data, r.bits_consumed)
    assert inc.fd.num_groups > 1

    # Decode sections in a shuffled order, respecting dependencies
    # (LfGlobal first, ACGlobal after DC) like a shuffled thread pool.
    rnd = random.Random(seed)
    inc._decode_lf_global(inc._section(data, 0))
    inc._done_sections.add(0)
    dc_idx = list(range(1, 1 + inc.fd.num_dc_groups))
    rnd.shuffle(dc_idx)
    for idx in dc_idx:
        inc._decode_dc_group(inc._section(data, idx), idx - 1)
        inc._done_sections.add(idx)
    acg = 1 + inc.fd.num_dc_groups
    inc._decode_ac_global(inc._section(data, acg))
    inc._done_sections.add(acg)
    ac_idx = list(range(inc.fd.num_groups))
    rnd.shuffle(ac_idx)
    for g in ac_idx:
        idx = acg + 1 + g
        inc._decode_ac_group(inc._section(data, idx), 0, g)
        inc._done_sections.add(idx)
        inc._group_pass_done.add((0, g))
    assert inc.complete
    xyb = inc.finalize()
    from libjxl_tpu.color.xyb import linear_to_srgb, xyb_to_linear_rgb
    srgb = linear_to_srgb(xyb_to_linear_rgb(xyb))
    got = np.clip(np.round(srgb * 255), 0, 255).astype(np.uint8)
    got = got.transpose(1, 2, 0)
    assert np.array_equal(got, ref)
