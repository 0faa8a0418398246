"""Header bundle + TOC roundtrips (mirrors fields_test.cc, toc_test.cc)."""

import random

import pytest

from libjxl_tpu.bitstream import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import bundle_read, bundle_write
from libjxl_tpu.bitstream.lehmer import compute_lehmer_code, decode_lehmer_code
from libjxl_tpu.bitstream.toc import (
    num_toc_entries, read_permutation, read_toc, write_permutation, write_toc,
)
from libjxl_tpu.color.color_encoding import (
    ColorEncoding, ColorSpace, TransferFunction,
)
from libjxl_tpu.frame.frame_header import (
    FrameEncoding, FrameHeader, LoopFilter, Passes,
)
from libjxl_tpu.frame.headers import (
    AnimationHeader, BitDepth, CodecMetadata, ExtraChannelInfo,
    ExtraChannelType, ImageMetadata, SizeHeader,
    read_codestream_headers, write_codestream_headers,
)


def roundtrip_bundle(bundle, make_empty):
    w = BitWriter()
    bundle_write(bundle, w)
    bits = w.bits_written
    w.align_to_byte()
    out = make_empty()
    r = BitReader(w.get_bytes())
    bundle_read(r, out)
    return out, bits


@pytest.mark.parametrize("size", [(1, 1), (13, 17), (256, 256), (1920, 1080),
                                  (4096, 2160), (640, 480), (257, 257)])
def test_size_header_roundtrip(size):
    sh = SizeHeader()
    sh.set(*size)
    out, _ = roundtrip_bundle(sh, SizeHeader)
    assert (out.xsize, out.ysize) == size


def test_size_header_small_is_compact():
    sh = SizeHeader()
    sh.set(256, 256)
    _, bits = roundtrip_bundle(sh, SizeHeader)
    assert bits <= 16  # small-mode: 1 + 5 + 3 + (ratio 1:1 -> no xsize)


def test_image_metadata_default_roundtrip():
    m = ImageMetadata()
    out, bits = roundtrip_bundle(m, ImageMetadata)
    assert bits == 1  # all_default
    assert out.bit_depth.bits_per_sample == 8
    assert out.xyb_encoded
    assert out.orientation == 1


def test_image_metadata_nondefault_roundtrip():
    m = ImageMetadata()
    m.bit_depth = BitDepth.uint(16)
    m.orientation = 5
    m.xyb_encoded = False
    m.color_encoding = ColorEncoding.linear_srgb()
    m.set_alpha_bits(8)
    out, _ = roundtrip_bundle(m, ImageMetadata)
    assert out.bit_depth.bits_per_sample == 16
    assert out.orientation == 5
    assert not out.xyb_encoded
    assert out.color_encoding.tf.transfer_function == TransferFunction.LINEAR
    assert out.has_alpha
    assert out.extra_channel_info[0].type == ExtraChannelType.ALPHA


def test_image_metadata_float_and_animation():
    m = ImageMetadata()
    m.bit_depth = BitDepth.f16()
    m.have_animation = True
    m.animation = AnimationHeader(tps_numerator=30, tps_denominator=1,
                                  num_loops=0)
    out, _ = roundtrip_bundle(m, ImageMetadata)
    assert out.bit_depth.floating_point_sample
    assert out.bit_depth.exponent_bits_per_sample == 5
    assert out.have_animation
    assert out.animation.tps_numerator == 30


def test_codestream_headers_roundtrip():
    meta = CodecMetadata()
    meta.size.set(800, 600)
    meta.m.bit_depth = BitDepth.uint(10)
    w = BitWriter()
    write_codestream_headers(meta, w)
    w.align_to_byte()
    out = read_codestream_headers(BitReader(w.get_bytes()))
    assert (out.xsize, out.ysize) == (800, 600)
    assert out.m.bit_depth.bits_per_sample == 10


def test_frame_header_default_roundtrip():
    meta = CodecMetadata()
    meta.size.set(512, 512)
    fh = FrameHeader(nonserialized_metadata=meta)
    w = BitWriter()
    bundle_write(fh, w)
    w.align_to_byte()
    out = FrameHeader(nonserialized_metadata=meta)
    bundle_read(BitReader(w.get_bytes()), out)
    assert out.encoding == FrameEncoding.VARDCT
    assert out.is_last
    assert out.passes.num_passes == 1
    fd = out.to_frame_dimensions()
    assert fd.num_groups == 4


def test_frame_header_modular_lossless():
    meta = CodecMetadata()
    meta.size.set(300, 200)
    meta.m.xyb_encoded = False
    fh = FrameHeader(nonserialized_metadata=meta)
    fh.encoding = FrameEncoding.MODULAR
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    fh.loop_filter.all_default = False
    w = BitWriter()
    bundle_write(fh, w)
    w.align_to_byte()
    out = FrameHeader(nonserialized_metadata=meta)
    bundle_read(BitReader(w.get_bytes()), out)
    assert out.encoding == FrameEncoding.MODULAR
    assert not out.loop_filter.gab
    assert out.loop_filter.epf_iters == 0
    assert out.to_frame_dimensions().xsize_padded == 300  # no padding


def test_frame_header_progressive_passes():
    meta = CodecMetadata()
    meta.size.set(1024, 768)
    fh = FrameHeader(nonserialized_metadata=meta)
    fh.passes = Passes(num_passes=3, num_downsample=1)
    fh.passes.shift[0] = 2
    fh.passes.shift[1] = 1
    fh.passes.downsample[0] = 4
    fh.passes.last_pass[0] = 0
    w = BitWriter()
    bundle_write(fh, w)
    w.align_to_byte()
    out = FrameHeader(nonserialized_metadata=meta)
    bundle_read(BitReader(w.get_bytes()), out)
    assert out.passes.num_passes == 3
    assert out.passes.shift[:3] == [2, 1, 0]
    assert out.passes.downsample[0] == 4


def test_lehmer_roundtrip():
    rng = random.Random(42)
    for n in [1, 2, 5, 16, 64, 100]:
        perm = list(range(n))
        rng.shuffle(perm)
        code = compute_lehmer_code(perm)
        assert decode_lehmer_code(code) == perm


def test_toc_roundtrip_no_permutation():
    sizes = [100, 2000, 0, 65535, 1 << 21]
    w = BitWriter()
    write_toc(sizes, w)
    got_sizes, offsets = read_toc(len(sizes), BitReader(w.get_bytes()))
    assert got_sizes == sizes
    assert offsets == [0, 100, 2100, 2100, 68100 - 465]  # prefix sums


def test_toc_roundtrip_with_permutation():
    rng = random.Random(17)
    sizes = [rng.randrange(0, 10000) for _ in range(20)]
    perm = list(range(20))
    rng.shuffle(perm)
    w = BitWriter()
    write_toc(sizes, w, permutation=perm)
    got_sizes, got_offsets = read_toc(len(sizes), BitReader(w.get_bytes()))
    # offsets are physical prefix sums, reported in permuted order
    offset = 0
    offsets = []
    for s in sizes:
        offsets.append(offset)
        offset += s
    assert got_sizes == [sizes[i] for i in perm]
    assert got_offsets == [offsets[i] for i in perm]


def test_permutation_roundtrip_standalone():
    rng = random.Random(3)
    for n in [3, 10, 64]:
        perm = list(range(n))
        rng.shuffle(perm)
        w = BitWriter()
        write_permutation(perm, 0, w)
        w.align_to_byte()
        got = read_permutation(0, n, BitReader(w.get_bytes()))
        assert got == perm


def test_num_toc_entries():
    assert num_toc_entries(1, 1, 1) == 1
    assert num_toc_entries(4, 1, 1) == 2 + 1 + 4
    assert num_toc_entries(4, 1, 3) == 2 + 1 + 12
