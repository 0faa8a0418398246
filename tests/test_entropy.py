"""Entropy-layer roundtrips (mirrors ans_test.cc / huffman tests)."""

import random

import numpy as np
import pytest

from libjxl_tpu.bitstream import BitReader, BitWriter
from libjxl_tpu.entropy import (
    ANS_TAB_SIZE, HybridUintConfig, Token, build_and_encode_histograms,
    decode_histograms, read_histogram, write_histogram, SymbolReader,
    write_tokens,
)
from libjxl_tpu.entropy.ans import normalize_counts, init_alias_table
from libjxl_tpu.entropy.context_map import (
    decode_context_map, encode_context_map, forward_mtf, inverse_mtf,
)
from libjxl_tpu.entropy.prefix import (
    build_and_store_prefix_code, decode_prefix_code,
)


def test_hybrid_uint_examples():
    # Examples from dec_ans.h:59-67 (split=4, msb=2, lsb=0).
    cfg = HybridUintConfig(4, 2, 0)
    for value, (token, nbits, bits) in {
        0: (0, 0, 0), 15: (15, 0, 0),
        16: (16, 2, 0b00), 17: (16, 2, 0b01), 20: (17, 2, 0),
        24: (18, 2, 0), 28: (19, 2, 0), 32: (20, 3, 0),
        65535: (63, 13, 0b1111111111111),
    }.items():
        assert cfg.encode(value) == (token, nbits, bits), value


def test_hybrid_uint_roundtrip_all_configs():
    rng = random.Random(7)
    for split in range(0, 8):
        for msb in range(0, min(split, 3) + 1):
            for lsb in range(0, min(split - msb, 3) + 1):
                cfg = HybridUintConfig(split, msb, lsb)
                for _ in range(50):
                    v = rng.randrange(0, 1 << rng.randrange(1, 20))
                    token, nbits, bits = cfg.encode(v)
                    w = BitWriter()
                    w.write(max(nbits, 1), bits if nbits else 0)
                    r = BitReader(w.get_bytes())
                    assert cfg.read(token, r) == v


def _roundtrip_histogram(raw):
    counts, omit = normalize_counts(raw, shift=12)
    assert sum(counts) == ANS_TAB_SIZE
    w = BitWriter()
    write_histogram(counts, w, shift=12, omit_pos=omit)
    w.align_to_byte()
    got = read_histogram(12, BitReader(w.get_bytes()))
    # read_histogram may return shorter (trailing zeros trimmed differently)
    n = max(len(got), len(counts))
    got += [0] * (n - len(got))
    expect = counts + [0] * (n - len(counts))
    assert got == expect


def test_histogram_roundtrips():
    rng = random.Random(99)
    _roundtrip_histogram([5, 3, 9, 1, 0, 0, 2, 8])
    _roundtrip_histogram([1, 1])
    _roundtrip_histogram([1000])
    _roundtrip_histogram([3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 7])
    _roundtrip_histogram([1] * 100)
    _roundtrip_histogram([rng.randrange(1, 1000) for _ in range(60)])
    # Large skewed histogram.
    _roundtrip_histogram([10000] + [1] * 50)


def test_alias_table_covers_distribution():
    counts, _ = normalize_counts([7, 1, 3, 9], shift=12)
    t = init_alias_table(counts, log_alpha_size=5)
    for sym, c in enumerate(counts):
        assert int(np.sum(t.value == sym)) == c
        offs = np.sort(t.offset[t.value == sym])
        assert list(offs) == list(range(c))


def _token_roundtrip(streams, num_contexts, use_prefix_code=False):
    w = BitWriter()
    codes = build_and_encode_histograms(
        num_contexts, streams, w, use_prefix_code=use_prefix_code)
    for s in streams:
        write_tokens(s, codes, w)
    w.align_to_byte()
    r = BitReader(w.get_bytes())
    dec_codes = decode_histograms(r, num_contexts)
    for s in streams:
        reader = SymbolReader(dec_codes, r)
        for t in s:
            assert reader.read(t.context) == t.value
        assert reader.check_final_state()
    r.align_to_byte()
    r.close()
    return len(w.get_bytes())


def test_token_roundtrip_single_context():
    rng = random.Random(1)
    tokens = [Token(0, rng.randrange(0, 100)) for _ in range(1000)]
    _token_roundtrip([tokens], 1)


def test_token_roundtrip_single_context_prefix():
    rng = random.Random(2)
    tokens = [Token(0, rng.randrange(0, 100)) for _ in range(1000)]
    _token_roundtrip([tokens], 1, use_prefix_code=True)


def test_token_roundtrip_multi_context():
    rng = random.Random(3)
    streams = []
    for _ in range(3):
        toks = []
        for _ in range(500):
            ctx = rng.randrange(8)
            # different contexts, different distributions
            v = rng.randrange(0, 4 + ctx * 37)
            toks.append(Token(ctx, v))
        streams.append(toks)
    _token_roundtrip(streams, 8)


def test_token_roundtrip_multi_context_prefix():
    rng = random.Random(4)
    streams = [[Token(rng.randrange(4), rng.randrange(64)) for _ in range(400)]]
    _token_roundtrip(streams, 4, use_prefix_code=True)


def test_token_roundtrip_large_values():
    rng = random.Random(5)
    tokens = [Token(0, rng.randrange(0, 1 << 20)) for _ in range(200)]
    tokens += [Token(0, 0)] * 100
    _token_roundtrip([tokens], 1)


def test_token_roundtrip_degenerate():
    # Single-symbol histogram (state never changes).
    tokens = [Token(0, 7)] * 64
    _token_roundtrip([tokens], 1)
    # Empty stream.
    _token_roundtrip([[]], 1)


def test_compression_actually_compresses():
    # Skewed distribution should compress well below raw size.
    rng = random.Random(6)
    tokens = [Token(0, 0 if rng.random() < 0.9 else rng.randrange(16))
              for _ in range(10000)]
    nbytes = _token_roundtrip([tokens], 1)
    assert nbytes < 2000  # ~0.5 bits/token + tables, raw would be 5000+


def test_mtf_roundtrip():
    rng = random.Random(8)
    values = [rng.randrange(16) for _ in range(100)]
    assert inverse_mtf(forward_mtf(values)) == values


@pytest.mark.parametrize("num_histograms", [1, 3, 8, 20])
def test_context_map_roundtrip(num_histograms):
    rng = random.Random(num_histograms)
    num_contexts = 50
    # Every histogram must be used at least once (decoder checks).
    cmap = list(range(num_histograms)) + [
        rng.randrange(num_histograms) for _ in range(num_contexts - num_histograms)]
    rng.shuffle(cmap)
    w = BitWriter()
    encode_context_map(cmap, num_histograms, w)
    w.align_to_byte()
    got, n = decode_context_map(num_contexts, BitReader(w.get_bytes()))
    assert got == cmap
    assert n == num_histograms


def test_prefix_code_roundtrip():
    rng = random.Random(11)
    for alphabet in [2, 3, 4, 5, 17, 100, 256]:
        counts = np.array([rng.randrange(0, 100) for _ in range(alphabet)],
                          np.int64)
        counts[rng.randrange(alphabet)] += 1000  # ensure some skew
        w = BitWriter()
        enc = build_and_store_prefix_code(counts, w)
        # encode some symbols
        syms = [s for s in range(alphabet) if counts[s] > 0]
        data = [rng.choice(syms) for _ in range(200)]
        for s in data:
            w.write(int(enc.depths[s]), int(enc.bits[s]))
        w.align_to_byte()
        r = BitReader(w.get_bytes())
        dec = decode_prefix_code(alphabet, r)
        for s in data:
            assert dec.read_symbol(r) == s


def test_prefix_code_degenerate():
    counts = np.zeros(10, np.int64)
    counts[4] = 100
    w = BitWriter()
    enc = build_and_store_prefix_code(counts, w)
    assert enc.degenerate_symbol == 4
    w.align_to_byte()
    dec = decode_prefix_code(10, BitReader(w.get_bytes()))
    assert dec.degenerate_symbol == 4


def test_lz77_stream_roundtrip():
    import numpy as np
    from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
    from libjxl_tpu.entropy.codes import (
        SymbolReader, apply_lz77, build_and_encode_histograms_lz77,
        decode_histograms, write_tokens_lz77,
    )
    rng = np.random.default_rng(3)
    base = rng.integers(0, 40, 64)
    val = np.tile(base, 40).astype(np.int64)
    val[1000:1050] = rng.integers(0, 5000, 50)
    ctx = (np.arange(len(val)) % 5).astype(np.int64)
    lz = apply_lz77(ctx, val)
    assert lz is not None and len(lz[0]) < len(val) // 4
    w = BitWriter()
    codes = build_and_encode_histograms_lz77(5, [lz], w)
    write_tokens_lz77(lz, codes, w)
    w.align_to_byte()
    r = BitReader(w.get_bytes())
    codes2 = decode_histograms(r, 5)
    reader = SymbolReader(codes2, r, 0)
    out = [reader.read(int(c)) for c in ctx]
    assert reader.check_final_state()
    np.testing.assert_array_equal(np.array(out), val)


def test_lz77_with_distance_multiplier():
    import numpy as np
    from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
    from libjxl_tpu.entropy.codes import (
        SymbolReader, apply_lz77, build_and_encode_histograms_lz77,
        decode_histograms, write_tokens_lz77,
    )
    # Vertical repetition at stride 37 exercises special distances.
    rng = np.random.default_rng(4)
    row = rng.integers(0, 30, 37)
    val = np.tile(row, 30).astype(np.int64)
    ctx = np.zeros(len(val), np.int64)
    dm = 37
    lz = apply_lz77(ctx, val, distance_multiplier=dm)
    assert lz is not None
    w = BitWriter()
    codes = build_and_encode_histograms_lz77(1, [lz], w)
    write_tokens_lz77(lz, codes, w)
    w.align_to_byte()
    r = BitReader(w.get_bytes())
    codes2 = decode_histograms(r, 1)
    reader = SymbolReader(codes2, r, dm)
    out = [reader.read(0) for _ in range(len(val))]
    assert reader.check_final_state()
    np.testing.assert_array_equal(np.array(out), val)
