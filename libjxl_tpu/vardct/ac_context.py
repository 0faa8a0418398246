"""AC coefficient context model.

Reference: lib/jxl/ac_context.h — block contexts from (channel, order
bucket, qf bucket, dc bucket), nonzero-count contexts, zero-density
contexts; and the BlockCtxMap (de)serialization from dec_frame's AC
global section.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.vardct.ac_strategy import NUM_ORDERS

NONZERO_BUCKETS = 37
ZERO_DENSITY_CONTEXT_COUNT = 458

_COEFF_FREQ_CONTEXT = [
    0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 15, 16, 16, 17, 17, 18, 18, 19, 19, 20, 20, 21, 21, 22, 22,
    23, 23, 23, 23, 24, 24, 24, 24, 25, 25, 25, 25, 26, 26, 26, 26,
    27, 27, 27, 27, 28, 28, 28, 28, 29, 29, 29, 29, 30, 30, 30, 30,
]

_COEFF_NUM_NONZERO_CONTEXT = [
    0, 0, 31, 62, 62, 93, 93, 93, 93, 123, 123, 123, 123,
    152, 152, 152, 152, 152, 152, 152, 152, 180, 180, 180, 180, 180,
    180, 180, 180, 180, 180, 180, 180, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
]

DEFAULT_CTX_MAP = [
    0, 1, 2, 2, 3, 3, 4, 5, 6, 6, 6, 6, 6,
    7, 8, 9, 9, 10, 11, 12, 13, 14, 14, 14, 14, 14,
    7, 8, 9, 9, 10, 11, 12, 13, 14, 14, 14, 14, 14,
]


def zero_density_context(nonzeros_left: int, k: int, covered_blocks: int,
                         log2_covered_blocks: int, prev: int) -> int:
    """ac_context.h:66-86."""
    nonzeros_left = (nonzeros_left + covered_blocks - 1) >> log2_covered_blocks
    k >>= log2_covered_blocks
    return (_COEFF_NUM_NONZERO_CONTEXT[nonzeros_left]
            + _COEFF_FREQ_CONTEXT[k]) * 2 + prev


@dataclasses.dataclass
class BlockCtxMap:
    """ac_context.h:88-151."""
    dc_thresholds: list = dataclasses.field(
        default_factory=lambda: [[], [], []])
    qf_thresholds: list = dataclasses.field(default_factory=list)
    ctx_map: list = dataclasses.field(
        default_factory=lambda: list(DEFAULT_CTX_MAP))
    num_ctxs: int = 15
    num_dc_ctxs: int = 1

    def context(self, dc_idx: int, qf: int, order_bucket: int,
                c: int) -> int:
        qf_idx = sum(1 for t in self.qf_thresholds if qf > t)
        idx = (c ^ 1) if c < 2 else 2
        idx = idx * NUM_ORDERS + order_bucket
        idx = idx * (len(self.qf_thresholds) + 1) + qf_idx
        idx = idx * self.num_dc_ctxs + dc_idx
        return self.ctx_map[idx]

    def dc_context(self, dc_vals) -> int:
        """Index from per-channel DC threshold buckets (used by DC ctx)."""
        idx = 0
        for c in (0, 1, 2):
            bucket = sum(1 for t in self.dc_thresholds[c] if dc_vals[c] > t)
            idx = idx * (len(self.dc_thresholds[c]) + 1) + bucket
        return idx

    def zero_density_offset(self, block_ctx: int) -> int:
        return self.num_ctxs * NONZERO_BUCKETS \
            + ZERO_DENSITY_CONTEXT_COUNT * block_ctx

    def num_ac_contexts(self) -> int:
        return self.num_ctxs * (NONZERO_BUCKETS + ZERO_DENSITY_CONTEXT_COUNT)

    def nonzero_context(self, non_zeros: int, block_ctx: int) -> int:
        non_zeros = min(non_zeros, 64)
        ctx = non_zeros if non_zeros < 8 else 4 + non_zeros // 2
        return ctx * self.num_ctxs + block_ctx

    # -- serialization (dec_frame.cc ProcessACGlobal reads this via
    # BlockCtxMap::Decode in ac_context... actually in dec_cache /
    # dec_frame: kBlockCtxMap custom coding) ---------------------------

    def decode(self, r: BitReader) -> None:
        """BlockCtxMap decode (dec_frame.cc:418-447 area)."""
        from libjxl_tpu.entropy.context_map import decode_context_map
        from libjxl_tpu.base.signed import unpack_signed
        from libjxl_tpu.bitstream.fields import read_u32
        from libjxl_tpu.bitstream.fields import U32Enc, Bits, BitsOffset

        is_default = r.read_bool()
        if is_default:
            self.__init__()
            return
        dct_dist = U32Enc(Bits(4), BitsOffset(8, 16), BitsOffset(16, 272),
                          BitsOffset(32, 65808))
        self.num_dc_ctxs = 1
        self.dc_thresholds = [[], [], []]
        for c in range(3):
            num_thresholds = r.read(4)
            self.dc_thresholds[c] = [
                unpack_signed(read_u32(dct_dist, r))
                for _ in range(num_thresholds)]
            self.num_dc_ctxs *= num_thresholds + 1
        qft_dist = U32Enc(Bits(2), BitsOffset(3, 4), BitsOffset(5, 12),
                          BitsOffset(8, 44))
        num_qf = r.read(4)
        self.qf_thresholds = [read_u32(qft_dist, r) + 1
                              for _ in range(num_qf)]
        if self.num_dc_ctxs * (num_qf + 1) > 64:
            raise BitstreamError("block context map too big")
        total = 3 * NUM_ORDERS * self.num_dc_ctxs * (num_qf + 1)
        self.ctx_map, num_ctxs = decode_context_map(total, r)
        self.num_ctxs = num_ctxs
        if num_ctxs > 16:
            raise BitstreamError("too many distinct block contexts")

    def encode(self, w: BitWriter) -> None:
        is_default = (self.ctx_map == DEFAULT_CTX_MAP
                      and not self.qf_thresholds
                      and all(not t for t in self.dc_thresholds))
        w.write_bool(is_default)
        if is_default:
            return
        from libjxl_tpu.entropy.context_map import encode_context_map
        from libjxl_tpu.base.signed import pack_signed
        from libjxl_tpu.bitstream.fields import write_u32
        from libjxl_tpu.bitstream.fields import U32Enc, Bits, BitsOffset

        dct_dist = U32Enc(Bits(4), BitsOffset(8, 16), BitsOffset(16, 272),
                          BitsOffset(32, 65808))
        for c in range(3):
            w.write(4, len(self.dc_thresholds[c]))
            for t in self.dc_thresholds[c]:
                write_u32(dct_dist, pack_signed(t), w)
        qft_dist = U32Enc(Bits(2), BitsOffset(3, 4), BitsOffset(5, 12),
                          BitsOffset(8, 44))
        w.write(4, len(self.qf_thresholds))
        for t in self.qf_thresholds:
            write_u32(qft_dist, t - 1, w)
        encode_context_map(self.ctx_map, self.num_ctxs, w)


def find_best_block_entropy_model(distance: float, raw_quant, strategies,
                                  decoding_speed: int = 0) -> BlockCtxMap:
    """Encoder-side block-context clustering
    (enc_heuristics.cc:69-204 FindBestBlockEntropyModel): derive qf
    thresholds from the quant-field distribution and greedily merge
    (order-bucket, qf-segment) cells by occupancy into a few luma
    contexts (+ a smaller chroma cluster set). Returns the default map
    for small images."""
    import numpy as np

    from libjxl_tpu.vardct.ac_strategy import STRATEGY_ORDER

    if decoding_speed >= 1:
        simple = [0] * NUM_ORDERS + [1] * (2 * NUM_ORDERS)
        return BlockCtxMap(ctx_map=simple, num_ctxs=2, num_dc_ctxs=1)

    rq = np.asarray(raw_quant)
    tot = rq.size
    size_for_ctx_model = (1 << 10) * distance
    if tot < size_for_ctx_model:
        return BlockCtxMap()

    # Expand covered (-1) cells to their first-block strategy so every
    # 8x8 cell counts, like AcStrategyRow iteration does.
    st = np.asarray(strategies).copy()
    from libjxl_tpu.vardct import ac_strategy as acs
    for by, bx in zip(*np.nonzero(st > 0)):
        s = int(st[by, bx])
        cx, cy = acs.covered_blocks(s)
        st[by:by + cy, bx:bx + cx] = s
    st = np.maximum(st, 0)
    ord_map = np.asarray(STRATEGY_ORDER, np.int64)[st]
    qf0 = np.clip(rq.astype(np.int64) - 1, 0, 255)
    qf_counts = np.bincount(qf0.ravel(), minlength=256)
    comb = ord_map.ravel() * 256 + qf0.ravel()
    qf_ord_counts = np.bincount(comb, minlength=NUM_ORDERS * 256) \
        .reshape(NUM_ORDERS, 256)

    size_for_qf_split = (1 << 13) * distance
    num_qf_segments = 1 if tot < size_for_qf_split else 2
    qft: list = []
    cumsum = 0
    nxt = 1
    last_cut = 256
    cut = tot * nxt // num_qf_segments
    for j in range(256):
        cumsum += int(qf_counts[j])
        if cumsum > cut:
            if j != 0:
                qft.append(j)
            last_cut = j
            while cumsum > cut:
                nxt += 1
                cut = tot * nxt // num_qf_segments
        elif nxt > len(qft) + 1:
            if j - 1 == last_cut and j != 0:
                qft.append(j)

    # Occupancy per (order, qf segment).
    nseg = len(qft) + 1
    counts = [0] * (NUM_ORDERS * nseg)
    qft_pos = 0
    for j in range(256):
        if qft_pos < len(qft) and j == qft[qft_pos]:
            qft_pos += 1
        for i in range(NUM_ORDERS):
            counts[qft_pos + i * nseg] += int(qf_ord_counts[i][j])

    # Repeatedly merge the lowest-count cluster into the second-lowest.
    remap = list(range(nseg * NUM_ORDERS))
    clusters = list(remap)
    nb_clusters = max(2, min(int(tot / size_for_ctx_model / 2), 9))
    nb_clusters_chroma = max(1, min(int(tot / size_for_ctx_model / 3), 5))
    while len(clusters) > nb_clusters:
        clusters.sort(key=lambda a: -counts[a])
        counts[clusters[-2]] += counts[clusters[-1]]
        counts[clusters[-1]] = 0
        remap[clusters[-1]] = clusters[-2]
        clusters.pop()
    for i in range(len(remap)):
        while remap[remap[i]] != remap[i]:
            remap[i] = remap[remap[i]]
    remap_remap = [len(remap)] * len(remap)
    num = 0
    for i in range(len(remap)):
        if remap_remap[remap[i]] == len(remap):
            remap_remap[remap[i]] = num
            num += 1
        remap[i] = remap_remap[remap[i]]
    ctx_map = list(remap)
    for i in range(len(remap), len(remap) * 3):
        ctx_map.append(num + max(0, min(int(remap[i % len(remap)]),
                                        nb_clusters_chroma - 1)))
    return BlockCtxMap(qf_thresholds=qft, ctx_map=ctx_map,
                       num_ctxs=max(ctx_map) + 1, num_dc_ctxs=1)
