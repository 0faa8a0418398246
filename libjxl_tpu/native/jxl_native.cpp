// Native host runtime: the sequential entropy-coded loops.
//
// TPU-native split (SURVEY.md §7): device code handles everything after
// tokens; these loops — rANS symbol decode, modular per-pixel
// prediction with MA-tree contexts and the self-correcting weighted
// predictor, VarDCT AC coefficient (de)tokenization — are branchy,
// byte-oriented and sequential per section, so they live in C++ on the
// host (analogous to the reference's lib/jxl decoder internals, but
// emitting dense tensors for the device instead of row streams).
//
// Exposed via a C ABI consumed with ctypes (no pybind11 in this image).
// Semantics mirror the Python reference implementations in
// libjxl_tpu/modular/codec.py and libjxl_tpu/vardct/group.py, which are
// kept as the differential-testing oracle.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

constexpr uint32_t kAnsLogTabSize = 12;
constexpr uint32_t kAnsTabSize = 1u << kAnsLogTabSize;
constexpr uint32_t kAnsSignature = 0x13;
constexpr uint32_t kWindowSize = 1u << 20;
constexpr uint32_t kWindowMask = kWindowSize - 1;

// ---------------------------------------------------------------------------
// Bit reader (LSB-first), matching libjxl_tpu/bitstream/bit_io.py.

struct BitReaderC {
  const uint8_t* data;
  uint64_t size;
  uint64_t pos;        // next byte index
  uint64_t buf;
  uint32_t bits;       // bits in buf
  uint64_t consumed;
  bool overread;

  void refill(uint32_t need) {
    if (bits >= need) return;
    if (pos + 8 <= size) {
      // Bulk refill: one unaligned 64-bit load tops the buffer up to
      // >= 56 bits (need is always <= 32).
      uint64_t chunk;
      __builtin_memcpy(&chunk, data + pos, 8);
      buf |= chunk << bits;
      uint32_t nbytes = (63 - bits) >> 3;
      pos += nbytes;
      bits += nbytes * 8;
      return;
    }
    while (bits < need) {
      if (pos < size) {
        buf |= static_cast<uint64_t>(data[pos++]) << bits;
      } else {
        overread = true;
      }
      bits += 8;
    }
  }

  uint32_t read(uint32_t n) {
    if (n == 0) return 0;
    refill(n);
    uint32_t v = static_cast<uint32_t>(buf & ((1ull << n) - 1));
    buf >>= n;
    bits -= n;
    consumed += n;
    return v;
  }

  uint32_t peek16() {
    refill(16);
    return static_cast<uint32_t>(buf & 0xFFFF);
  }
  // Peek-style refill: pads zeros past the stream end WITHOUT flagging
  // overread (prefix-code LUT peeks may extend past the last code; the
  // caller checks `consumed` after consuming the actual code length).
  void refill_pad(uint32_t need) {
    if (bits >= need) return;
    if (pos + 8 <= size) {
      uint64_t chunk;
      __builtin_memcpy(&chunk, data + pos, 8);
      buf |= chunk << bits;
      uint32_t nbytes = (63 - bits) >> 3;
      pos += nbytes;
      bits += nbytes * 8;
      return;
    }
    while (bits < need) {
      if (pos < size) {
        buf |= static_cast<uint64_t>(data[pos++]) << bits;
      }
      bits += 8;
    }
  }
  void consume(uint32_t n) {
    buf >>= n;
    bits -= n;
    consumed += n;
  }
};

// ---------------------------------------------------------------------------
// ANS reader over flattened alias tables.

struct UintCfg {
  uint32_t split_exponent, msb, lsb;
};

struct AnsDecoderC {
  BitReaderC* br;
  uint32_t state;
  // Interleaved alias slots: value:8 | offset:12 | (freq-1):12 — one
  // 4-byte load per symbol instead of three table hits, and half the
  // cache footprint of the former 8-byte packing.
  const uint32_t* alias_packed;  // [clusters][4096]
  const uint8_t* context_map;    // ctx -> cluster
  const UintCfg* cfgs;           // per cluster
  int use_prefix;                // prefix-code mode (prefix_lut set)
  // Prefix mode: per-cluster 15-bit single-level decode LUT; entry =
  // sym | (len << 16). Index = next 15 stream bits, LSB-first.
  const uint32_t* prefix_lut;    // [clusters][1 << 15]
  // First-level 12-bit table (16KB/cluster, stays L1/L2-resident
  // where the 128KB full table cache-misses on nearly every symbol):
  // covers codes of length <= 12; 0 = escape to prefix_lut.
  const uint32_t* prefix_l1;     // [clusters][1 << 12]
  // LZ77
  int lz77_enabled;
  uint32_t lz77_min_symbol, lz77_min_length, lz77_ctx;
  UintCfg lz77_cfg;
  std::vector<uint32_t> window;
  uint32_t num_decoded = 0, num_to_copy = 0, copy_pos = 0;
  const uint32_t* special_distances;
  uint32_t num_special;

  void init_state() { state = use_prefix ? 0 : br->read(32); }

  inline uint32_t read_symbol_prefix(uint32_t cluster) {
    br->refill_pad(15);
    uint32_t idx = static_cast<uint32_t>(br->buf) & 0x7FFF;
    uint32_t e = prefix_l1[(static_cast<size_t>(cluster) << 12)
                           | (idx & 0xFFF)];
    if (e == 0)
      e = prefix_lut[(static_cast<size_t>(cluster) << 15) | idx];
    br->consume(e >> 16);
    if (br->consumed > br->size * 8) br->overread = true;
    return e & 0xFFFF;
  }

  inline uint32_t read_symbol(uint32_t cluster) {
    if (use_prefix) return read_symbol_prefix(cluster);
    uint32_t res = state & (kAnsTabSize - 1);
    const size_t base = static_cast<size_t>(cluster) * kAnsTabSize + res;
    const uint32_t slot = alias_packed[base];
    uint32_t sym = slot & 0xFF;
    uint32_t off = (slot >> 8) & 0xFFF;
    uint32_t freq = (slot >> 20) + 1;
    state = freq * (state >> kAnsLogTabSize) + off;
    if (state < (1u << 16)) {
      state = (state << 16) | br->peek16();
      br->consume(16);
    }
    return sym;
  }

  inline uint32_t read_uint_cfg(const UintCfg& c, uint32_t token) {
    uint32_t split_token = 1u << c.split_exponent;
    if (token < split_token) return token;
    uint32_t mt = c.msb + c.lsb;
    uint32_t nbits = (c.split_exponent - mt + ((token - split_token) >> mt))
                     & 31u;
    uint32_t low = token & ((1u << c.lsb) - 1);
    token >>= c.lsb;
    uint32_t bits = br->read(nbits);
    uint32_t msb_part = (1u << c.msb) | (token & ((1u << c.msb) - 1));
    return (((msb_part << nbits) | bits) << c.lsb) | low;
  }

  // Fast path for streams with LZ77 disabled (the AC coefficient
  // streams): no window bookkeeping, straight token+extra-bits read.
  inline uint32_t read_clustered_nolz(uint32_t cluster) {
    uint32_t token = read_symbol(cluster);
    return read_uint_cfg(cfgs[cluster], token);
  }

  // ReadHybridUintClustered with LZ77 window (dec_ans.h:288-353).
  uint32_t read_clustered(uint32_t cluster) {
    if (!lz77_enabled) return read_clustered_nolz(cluster);
    if (lz77_enabled && num_to_copy > 0) {
      uint32_t ret = window[copy_pos++ & kWindowMask];
      num_to_copy--;
      window[num_decoded++ & kWindowMask] = ret;
      return ret;
    }
    uint32_t token = read_symbol(cluster);
    if (lz77_enabled && token >= lz77_min_symbol) {
      num_to_copy = read_uint_cfg(lz77_cfg, token - lz77_min_symbol)
                    + lz77_min_length;
      uint32_t d_token = read_symbol(lz77_ctx);
      uint32_t distance = read_uint_cfg(cfgs[lz77_ctx], d_token);
      if (distance < num_special) {
        distance = special_distances[distance];
      } else {
        distance = distance + 1 - num_special;
      }
      if (distance > num_decoded) distance = num_decoded;
      if (distance > kWindowSize) distance = kWindowSize;
      copy_pos = num_decoded - distance;
      if (distance == 0) {
        uint32_t to_fill = std::min(num_to_copy, kWindowSize);
        std::fill(window.begin(), window.begin() + to_fill, 0u);
      }
      uint32_t ret = window[copy_pos++ & kWindowMask];
      num_to_copy--;
      window[num_decoded++ & kWindowMask] = ret;
      return ret;
    }
    uint32_t ret = read_uint_cfg(cfgs[cluster], token);
    if (lz77_enabled) {
      window[num_decoded++ & kWindowMask] = ret;
    }
    return ret;
  }

  inline uint32_t read_ctx(uint32_t ctx) {
    return read_clustered(context_map[ctx]);
  }

  bool check_final() const {
    return use_prefix || state == (kAnsSignature << 16);
  }
};

inline int32_t unpack_signed(uint32_t u) {
  return (u & 1) ? -static_cast<int32_t>((u + 1) >> 1)
                 : static_cast<int32_t>(u >> 1);
}
inline uint32_t pack_signed(int64_t v) {
  return v >= 0 ? static_cast<uint32_t>(2 * v)
                : static_cast<uint32_t>(-2 * v - 1);
}

// ---------------------------------------------------------------------------
// Modular decode: predictors, WP, properties, tree lookup.

struct TreeNode {
  int32_t property;   // -1 = leaf
  int32_t splitval;
  int32_t lchild;     // leaf: context id
  int32_t rchild;
  int32_t predictor;
  int32_t offset;
  int32_t multiplier;
};

struct WpHeader {
  int32_t p1c, p2c, p3ca, p3cb, p3cc, p3cd, p3ce;
  int32_t w0, w1, w2, w3;
};

constexpr int kPredExtraBits = 3;
constexpr int kPredRound = ((1 << kPredExtraBits) >> 1) - 1;

struct WpState {
  WpHeader h;
  int xsize;
  std::vector<int64_t> pred_errors[4];
  std::vector<int64_t> error;
  int64_t prediction[4];
  int64_t pred = 0;
  uint32_t divlookup[64];
  int32_t wts[4];

  WpState(const WpHeader& hdr, int w) : h(hdr), xsize(w) {
    for (auto& pe : pred_errors) pe.assign(2 * (w + 2), 0);
    error.assign(2 * (w + 2), 0);
    for (int i = 0; i < 64; i++) divlookup[i] = (1u << 24) / (i + 1);
    wts[0] = h.w0; wts[1] = h.w1; wts[2] = h.w2; wts[3] = h.w3;
  }

  inline uint32_t error_weight(uint64_t x, uint32_t maxweight) const {
    // shift = floor_log2(x+1) - 5 clamped >= 0, branch-free via clz.
    const uint64_t t = x + 1;
    const int bw = 64 - __builtin_clzll(t);   // bit width of t (t >= 1)
    const int shift = bw > 6 ? bw - 6 : 0;
    return 4 + ((maxweight * static_cast<uint64_t>(divlookup[x >> shift]))
                >> shift);
  }

  int64_t predict(int x, int y, int64_t n, int64_t w, int64_t ne, int64_t nw,
                  int64_t nn, int64_t* max_err_out) {
    const int stride = xsize + 2;
    const int cur_row = (y & 1) ? 0 : stride;
    const int prev_row = (y & 1) ? stride : 0;
    const int pos_n = prev_row + x;
    const int pos_ne = x < xsize - 1 ? pos_n + 1 : pos_n;
    const int pos_nw = x > 0 ? pos_n - 1 : pos_n;

    uint32_t weights[4];
    for (int i = 0; i < 4; i++) {
      uint64_t sum = static_cast<uint64_t>(
          pred_errors[i][pos_n] + pred_errors[i][pos_ne]
          + pred_errors[i][pos_nw]);
      weights[i] = error_weight(sum, wts[i]);
    }

    const int64_t nb = n << kPredExtraBits;
    const int64_t wb = w << kPredExtraBits;
    const int64_t neb = ne << kPredExtraBits;
    const int64_t nwb = nw << kPredExtraBits;
    const int64_t nnb = nn << kPredExtraBits;

    int64_t te_w = x == 0 ? 0 : error[cur_row + x - 1];
    int64_t te_n = error[pos_n];
    int64_t te_nw = error[pos_nw];
    int64_t te_ne = error[pos_ne];
    int64_t sum_wn = te_n + te_w;

    int64_t max_err = te_w;
    if (std::abs(te_n) > std::abs(max_err)) max_err = te_n;
    if (std::abs(te_nw) > std::abs(max_err)) max_err = te_nw;
    if (std::abs(te_ne) > std::abs(max_err)) max_err = te_ne;
    *max_err_out = max_err;

    prediction[0] = wb + neb - nb;
    prediction[1] = nb - (((sum_wn + te_ne) * h.p1c) >> 5);
    prediction[2] = wb - (((sum_wn + te_nw) * h.p2c) >> 5);
    prediction[3] = nb - ((te_nw * h.p3ca + te_n * h.p3cb + te_ne * h.p3cc
                           + (nnb - nb) * h.p3cd + (nwb - wb) * h.p3ce) >> 5);

    uint32_t weight_sum = weights[0] + weights[1] + weights[2] + weights[3];
    uint32_t log_weight = 31 - __builtin_clz(weight_sum);
    uint32_t ws[4];
    weight_sum = 0;
    for (int i = 0; i < 4; i++) {
      ws[i] = weights[i] >> (log_weight - 4);
      weight_sum += ws[i];
    }
    int64_t s = (static_cast<int64_t>(weight_sum) >> 1) - 1;
    for (int i = 0; i < 4; i++) s += prediction[i] * ws[i];
    pred = (s * static_cast<int64_t>(divlookup[weight_sum - 1])) >> 24;

    if (((te_n ^ te_w) | (te_n ^ te_nw)) <= 0) {
      int64_t mx = std::max(wb, std::max(neb, nb));
      int64_t mn = std::min(wb, std::min(neb, nb));
      pred = std::max(mn, std::min(mx, pred));
    }
    return (pred + kPredRound) >> kPredExtraBits;
  }

  void update_errors(int64_t val, int x, int y) {
    const int stride = xsize + 2;
    const int cur_row = (y & 1) ? 0 : stride;
    const int prev_row = (y & 1) ? stride : 0;
    const int64_t vb = val << kPredExtraBits;
    error[cur_row + x] = pred - vb;
    for (int i = 0; i < 4; i++) {
      int64_t err = (std::llabs(prediction[i] - vb) + kPredRound)
                    >> kPredExtraBits;
      pred_errors[i][cur_row + x] = err;
      pred_errors[i][prev_row + x + 1] += err;
    }
  }
};

inline int64_t clamped_gradient(int64_t n, int64_t w, int64_t l) {
  const int64_t m = std::min(n, w);
  const int64_t M = std::max(n, w);
  const int64_t grad = n + w - l;
  return l < m ? M : (l > M ? m : grad);
}

inline int64_t select_pred(int64_t a, int64_t b, int64_t c) {
  int64_t p = a + b - c;
  return std::llabs(p - a) < std::llabs(p - b) ? a : b;
}

inline int64_t tdiv2(int64_t v) { return v / 2; }  // trunc toward zero

inline int64_t predict_one(int p, int64_t left, int64_t top, int64_t toptop,
                           int64_t topleft, int64_t topright,
                           int64_t leftleft, int64_t trr, int64_t wp) {
  switch (p) {
    case 0: return 0;
    case 1: return left;
    case 2: return top;
    case 3: return tdiv2(left + top);
    case 4: return select_pred(left, top, topleft);
    case 5: return clamped_gradient(left, top, topleft);
    case 6: return wp;
    case 7: return topright;
    case 8: return topleft;
    case 9: return leftleft;
    case 10: return tdiv2(left + topleft);
    case 11: return tdiv2(topleft + top);
    case 12: return tdiv2(top + topright);
    case 13:
      return (6 * top - 2 * toptop + 7 * left + leftleft + trr
              + 3 * topright + 8) / 16;
    default: return 0;
  }
}

struct ChannelDesc {
  int32_t w, h, hshift, vshift;
  int32_t* data;  // row-major
};

constexpr int kNumStaticProps = 2;
constexpr int kNumNonrefProps = kNumStaticProps + 13 + 1;
constexpr int kWpProp = kNumNonrefProps - 1;

struct RefProps {
  // 4 rows per eligible previous channel, computed per row.
  std::vector<const ChannelDesc*> sources;
  std::vector<int64_t> rows;  // [num_sources*4][w]
  int w;

  void init(const ChannelDesc* chans, int chan_idx, int num_needed) {
    sources.clear();
    const ChannelDesc& ch = chans[chan_idx];
    w = ch.w;
    for (int j = chan_idx - 1;
         j >= 0 && static_cast<int>(sources.size()) * 4 < num_needed; j--) {
      const ChannelDesc& cj = chans[j];
      if (cj.w != ch.w || cj.h != ch.h || cj.hshift != ch.hshift
          || cj.vshift != ch.vshift) continue;
      sources.push_back(&cj);
    }
    rows.assign(sources.size() * 4 * w, 0);
  }

  void compute_row(int y) {
    for (size_t s = 0; s < sources.size(); s++) {
      const ChannelDesc& cj = *sources[s];
      const int32_t* row = cj.data + static_cast<int64_t>(y) * cj.w;
      const int32_t* prev = y ? cj.data + static_cast<int64_t>(y - 1) * cj.w
                              : nullptr;
      int64_t* r0 = &rows[(s * 4 + 0) * w];
      int64_t* r1 = &rows[(s * 4 + 1) * w];
      int64_t* r2 = &rows[(s * 4 + 2) * w];
      int64_t* r3 = &rows[(s * 4 + 3) * w];
      for (int x = 0; x < w; x++) {
        int64_t v = row[x];
        int64_t vleft = x ? row[x - 1] : 0;
        int64_t vtop = y ? prev[x] : vleft;
        int64_t vtopleft = (x && y) ? prev[x - 1] : vleft;
        int64_t vpred = clamped_gradient(vleft, vtop, vtopleft);
        r0[x] = std::llabs(v);
        r1[x] = v;
        r2[x] = std::llabs(v - vpred);
        r3[x] = v - vpred;
      }
    }
  }
};

}  // namespace

extern "C" {

// Decode one modular channel in place. Returns 0 on success, negative
// error code otherwise. `handle` layout is managed by the paired
// create/destroy functions below.

struct ModularDecoderHandle {
  BitReaderC br;
  AnsDecoderC ans;
  std::vector<UintCfg> cfg_storage;
  std::vector<uint32_t> special;
  std::vector<uint32_t> prefix_l1;
};

ModularDecoderHandle* mod_decoder_create(
    const uint8_t* data, uint64_t size, uint64_t bit_pos,
    const uint32_t* alias_packed, const uint8_t* context_map,
    const int32_t* uint_cfgs /* [clusters][3] */, int num_clusters,
    int lz77_enabled, uint32_t lz77_min_symbol, uint32_t lz77_min_length,
    uint32_t lz77_ctx, const int32_t* lz77_cfg /* [3] */,
    uint32_t distance_multiplier) {
  auto* h = new ModularDecoderHandle();
  h->br.data = data;
  h->br.size = size;
  h->br.pos = bit_pos / 8;
  h->br.buf = 0;
  h->br.bits = 0;
  h->br.consumed = bit_pos;
  h->br.overread = false;
  uint32_t rem = bit_pos % 8;
  if (rem) {
    // preload partial byte
    h->br.pos = bit_pos / 8;
    h->br.refill(8);
    h->br.buf >>= rem;
    h->br.bits -= rem;
  }
  h->cfg_storage.resize(num_clusters);
  for (int i = 0; i < num_clusters; i++) {
    h->cfg_storage[i] = {static_cast<uint32_t>(uint_cfgs[i * 3]),
                         static_cast<uint32_t>(uint_cfgs[i * 3 + 1]),
                         static_cast<uint32_t>(uint_cfgs[i * 3 + 2])};
  }
  h->ans.br = &h->br;
  h->ans.alias_packed = alias_packed;
  h->ans.context_map = context_map;
  h->ans.cfgs = h->cfg_storage.data();
  h->ans.use_prefix = 0;
  h->ans.lz77_enabled = lz77_enabled;
  h->ans.lz77_min_symbol = lz77_min_symbol;
  h->ans.lz77_min_length = lz77_min_length;
  h->ans.lz77_ctx = lz77_ctx;
  h->ans.lz77_cfg = {static_cast<uint32_t>(lz77_cfg[0]),
                     static_cast<uint32_t>(lz77_cfg[1]),
                     static_cast<uint32_t>(lz77_cfg[2])};
  if (lz77_enabled) {
    h->ans.window.assign(kWindowSize, 0);
    // Special distances (dec_ans.h kSpecialDistances).
    static const int8_t sd[120][2] = {
        {0,1},{1,0},{1,1},{-1,1},{0,2},{2,0},{1,2},{-1,2},{2,1},{-2,1},
        {2,2},{-2,2},{0,3},{3,0},{1,3},{-1,3},{3,1},{-3,1},{2,3},{-2,3},
        {3,2},{-3,2},{0,4},{4,0},{1,4},{-1,4},{4,1},{-4,1},{3,3},{-3,3},
        {2,4},{-2,4},{4,2},{-4,2},{0,5},{3,4},{-3,4},{4,3},{-4,3},{5,0},
        {1,5},{-1,5},{5,1},{-5,1},{2,5},{-2,5},{5,2},{-5,2},{4,4},{-4,4},
        {3,5},{-3,5},{5,3},{-5,3},{0,6},{6,0},{1,6},{-1,6},{6,1},{-6,1},
        {2,6},{-2,6},{6,2},{-6,2},{4,5},{-4,5},{5,4},{-5,4},{3,6},{-3,6},
        {6,3},{-6,3},{0,7},{7,0},{1,7},{-1,7},{5,5},{-5,5},{7,1},{-7,1},
        {4,6},{-4,6},{6,4},{-6,4},{2,7},{-2,7},{7,2},{-7,2},{3,7},{-3,7},
        {7,3},{-7,3},{5,6},{-5,6},{6,5},{-6,5},{8,0},{4,7},{-4,7},{7,4},
        {-7,4},{8,1},{8,2},{6,6},{-6,6},{8,3},{5,7},{-5,7},{7,5},{-7,5},
        {8,4},{6,7},{-6,7},{7,6},{-7,6},{8,5},{7,7},{-7,7},{8,6},{8,7}};
    h->special.resize(distance_multiplier ? 120 : 0);
    for (size_t i = 0; i < h->special.size(); i++) {
      int d = sd[i][0] + static_cast<int>(distance_multiplier) * sd[i][1];
      h->special[i] = d > 1 ? d : 1;
    }
    h->ans.special_distances = h->special.data();
    h->ans.num_special = static_cast<uint32_t>(h->special.size());
  } else {
    h->ans.special_distances = nullptr;
    h->ans.num_special = 0;
  }
  h->ans.init_state();
  return h;
}

// Switch a decoder handle to prefix-code mode. lut: [clusters][1<<15]
// uint32 entries (sym | len<<16); replaces the ANS alias tables.
void mod_decoder_set_prefix(ModularDecoderHandle* h,
                            const uint32_t* lut) {
  h->ans.use_prefix = 1;
  h->ans.prefix_lut = lut;
  const size_t nc = h->cfg_storage.size();
  h->prefix_l1.assign(nc << 12, 0);
  for (size_t c = 0; c < nc; c++) {
    for (size_t i = 0; i < (1u << 12); i++) {
      uint32_t e = lut[(c << 15) | i];
      if ((e >> 16) <= 12) h->prefix_l1[(c << 12) | i] = e;
    }
  }
  h->ans.prefix_l1 = h->prefix_l1.data();
  // Prefix streams carry no 32-bit ANS state: push back the bits
  // create()'s init_state consumed (they are exactly h->ans.state).
  h->br.buf = (h->br.buf << 32) | h->ans.state;
  h->br.bits += 32;
  h->br.consumed -= 32;
  h->ans.state = 0;
}

uint64_t mod_decoder_bit_pos(ModularDecoderHandle* h) {
  return h->br.consumed;
}

int mod_decoder_check_final(ModularDecoderHandle* h) {
  return (!h->br.overread && h->ans.check_final()) ? 1 : 0;
}

void mod_decoder_destroy(ModularDecoderHandle* h) { delete h; }

// Tree simplification: clone the MA tree resolving every split on a
// property whose value is constant for the scope (channel id, group
// id per channel; y per row) — the per-pixel walk then touches a much
// smaller tree (FlatTree/filtering idea from
// modular/encoding/dec_ma.h, reimplemented structurally).

static int copy_simplified(const TreeNode* tree, int pos, int prop,
                           int64_t value, std::vector<TreeNode>& out) {
  const TreeNode& n = tree[pos];
  if (n.property < 0) {
    out.push_back(n);
    return static_cast<int>(out.size()) - 1;
  }
  if (n.property == prop) {
    int child = value > n.splitval ? n.lchild : n.rchild;
    return copy_simplified(tree, child, prop, value, out);
  }
  int idx = static_cast<int>(out.size());
  out.push_back(n);
  int l = copy_simplified(tree, n.lchild, prop, value, out);
  int r = copy_simplified(tree, n.rchild, prop, value, out);
  out[idx].lchild = l;
  out[idx].rchild = r;
  return idx;
}

// Decode channel `chan_idx` of the image described by `chans`
// (num_chans entries), using `tree` (num_nodes). group_id is static
// property 1. Returns 0 on success.
int mod_decode_channel(ModularDecoderHandle* h, ChannelDesc* chans,
                       int num_chans, int chan_idx, int group_id,
                       const TreeNode* tree, int num_nodes,
                       const WpHeader* wp_header) {
  ChannelDesc& ch = chans[chan_idx];
  const int w = ch.w, hgt = ch.h;
  if (w == 0 || hgt == 0) return 0;
  AnsDecoderC& ans = h->ans;

  // Determine property needs.
  int max_prop = -1;
  bool use_wp = false;
  for (int i = 0; i < num_nodes; i++) {
    max_prop = std::max(max_prop, tree[i].property);
    if (tree[i].property == kWpProp) use_wp = true;
    if (tree[i].property == -1 && tree[i].predictor == 6) use_wp = true;
  }
  const int num_props = std::max(max_prop + 1, kNumNonrefProps);
  const int num_ref = num_props - kNumNonrefProps;

  // Fast path: single-leaf tree.
  if (num_nodes == 1 && !use_wp && num_ref == 0) {
    const TreeNode& leaf = tree[0];
    const uint32_t ctx = leaf.lchild;
    // Prefix-code streams without LZ77 (the fast-lossless layout):
    // register-local reader state, one combined refill per symbol
    // (<= 15 token bits + <= 32 extra bits fit one 47-bit top-up).
    if (ans.use_prefix && !ans.lz77_enabled &&
        (leaf.predictor == 0 ||
         (leaf.predictor == 5 && leaf.offset == 0 &&
          leaf.multiplier == 1))) {
      BitReaderC& b = *ans.br;
      const uint32_t cluster = ans.context_map[ctx];
      const uint32_t* lut =
          ans.prefix_lut + (static_cast<size_t>(cluster) << 15);
      const uint32_t* l1 =
          ans.prefix_l1 + (static_cast<size_t>(cluster) << 12);
      const UintCfg cfg = ans.cfgs[cluster];
      const uint32_t split_token = 1u << cfg.split_exponent;
      const uint32_t mt = cfg.msb + cfg.lsb;
      uint64_t buf = b.buf;
      uint32_t bits = b.bits;
      uint64_t pos = b.pos;
      uint64_t consumed = b.consumed;
      const uint8_t* data = b.data;
      const uint64_t size = b.size;
      auto next = [&]() -> uint32_t {
        if (bits < 47) {
          if (pos + 8 <= size) {
            uint64_t chunk;
            __builtin_memcpy(&chunk, data + pos, 8);
            buf |= chunk << bits;
            uint32_t nb = (63 - bits) >> 3;
            pos += nb;
            bits += nb * 8;
          } else {
            while (bits < 47 && pos < size) {
              buf |= static_cast<uint64_t>(data[pos++]) << bits;
              bits += 8;
            }
            if (bits < 47) bits = 47;  // zero pad; overread checked last
          }
        }
        uint32_t e = l1[static_cast<uint32_t>(buf) & 0xFFF];
        if (e == 0) e = lut[static_cast<uint32_t>(buf) & 0x7FFF];
        uint32_t len = e >> 16;
        uint32_t token = e & 0xFFFF;
        buf >>= len;
        bits -= len;
        consumed += len;
        if (token < split_token) return token;
        uint32_t nbits =
            (cfg.split_exponent - mt + ((token - split_token) >> mt)) & 31u;
        uint32_t low = token & ((1u << cfg.lsb) - 1);
        token >>= cfg.lsb;
        uint32_t extra = static_cast<uint32_t>(
            buf & ((nbits ? (1ull << nbits) : 1ull) - 1));
        buf >>= nbits;
        bits -= nbits;
        consumed += nbits;
        uint32_t msb_part = (1u << cfg.msb) | (token & ((1u << cfg.msb) - 1));
        return (((msb_part << nbits) | extra) << cfg.lsb) | low;
      };
      if (leaf.predictor == 0) {
        const int64_t mult = leaf.multiplier, off = leaf.offset;
        for (int64_t i = 0; i < static_cast<int64_t>(w) * hgt; i++) {
          ch.data[i] =
              static_cast<int32_t>(unpack_signed(next()) * mult + off);
        }
      } else {
        for (int y = 0; y < hgt; y++) {
          int32_t* r = ch.data + static_cast<int64_t>(y) * w;
          const int32_t* rt = r - w;
          for (int x = 0; x < w; x++) {
            int64_t left = x ? r[x - 1] : (y ? rt[x] : 0);
            int64_t top = y ? rt[x] : left;
            int64_t topleft = (x && y) ? rt[x - 1] : left;
            int64_t guess = clamped_gradient(top, left, topleft);
            r[x] = static_cast<int32_t>(unpack_signed(next()) + guess);
          }
        }
      }
      b.buf = buf;
      b.bits = bits;
      b.pos = pos;
      b.consumed = consumed;
      if (consumed > size * 8) b.overread = true;
      return b.overread ? -1 : 0;
    }
    if (leaf.predictor == 0) {
      for (int64_t i = 0; i < static_cast<int64_t>(w) * hgt; i++) {
        uint32_t v = ans.read_ctx(ctx);
        ch.data[i] = unpack_signed(v) * leaf.multiplier + leaf.offset;
      }
      return 0;
    }
    if (leaf.predictor == 5 && leaf.offset == 0 && leaf.multiplier == 1) {
      for (int y = 0; y < hgt; y++) {
        int32_t* r = ch.data + static_cast<int64_t>(y) * w;
        const int32_t* rt = r - w;
        for (int x = 0; x < w; x++) {
          int64_t left = x ? r[x - 1] : (y ? rt[x] : 0);
          int64_t top = y ? rt[x] : left;
          int64_t topleft = (x && y) ? rt[x - 1] : left;
          int64_t guess = clamped_gradient(top, left, topleft);
          uint32_t v = ans.read_ctx(ctx);
          r[x] = static_cast<int32_t>(unpack_signed(v) + guess);
        }
      }
      return 0;
    }
  }

  std::vector<int64_t> props(num_props, 0);
  props[0] = chan_idx;
  props[1] = group_id;
  WpState* wp = use_wp ? new WpState(*wp_header, w) : nullptr;
  RefProps refs;
  if (num_ref > 0) refs.init(chans, chan_idx, num_ref);

  // Resolve channel-constant splits once, row-constant splits per row.
  std::vector<TreeNode> tree_c0, tree_c, tree_row;
  tree_c0.reserve(num_nodes);
  copy_simplified(tree, 0, 0, chan_idx, tree_c0);
  tree_c.reserve(tree_c0.size());
  copy_simplified(tree_c0.data(), 0, 1, group_id, tree_c);

  // Properties any remaining split can test — unneeded ones are never
  // computed in the pixel loop (learned trees usually touch only a
  // handful of the 16).
  uint32_t needed = 0;
  for (const TreeNode& nd : tree_c)
    if (nd.property >= 0 && nd.property < 32) needed |= 1u << nd.property;
  const bool need89 = (needed & ((1u << 8) | (1u << 9))) != 0;

  // Single-property "ladder" trees (e.g. the WP-error tree the encoder
  // learns for DC planes: every split on property 15) become a sorted
  // interval table: a branchless compare-count replaces the
  // mispredicting pointer walk.
  std::vector<int64_t> lad_bounds;
  std::vector<int32_t> lad_leaves;

  for (int y = 0; y < hgt; y++) {
    props[2] = y;
    props[9] = 0;
    if (num_ref > 0) refs.compute_row(y);
    tree_row.clear();
    copy_simplified(tree_c.data(), 0, 2, y, tree_row);
    const TreeNode* rtree = tree_row.data();
    int ladder_prop = -1;
    if (tree_row.size() > 2) {
      ladder_prop = -2;
      for (const TreeNode& nd : tree_row) {
        if (nd.property < 0) continue;
        if (ladder_prop == -2) ladder_prop = nd.property;
        else if (ladder_prop != nd.property) { ladder_prop = -1; break; }
      }
      if (ladder_prop >= 0) {
        lad_bounds.clear();
        lad_leaves.clear();
        // In-order traversal, right (value <= splitval) side first:
        // bounds come out ascending, leaves in interval order.
        std::vector<std::pair<int32_t, int>> st;
        st.push_back({0, 0});
        while (!st.empty()) {
          auto [p, phase] = st.back();
          st.pop_back();
          const TreeNode& nd = rtree[p];
          if (nd.property < 0) {
            lad_leaves.push_back(p);
            continue;
          }
          if (phase == 0) {
            st.push_back({p, 1});
            st.push_back({nd.rchild, 0});
          } else {
            lad_bounds.push_back(nd.splitval);
            st.push_back({nd.lchild, 0});
          }
        }
      }
    }
    const size_t nbounds = lad_bounds.size();
    const int64_t* bptr = lad_bounds.data();
    int32_t* r = ch.data + static_cast<int64_t>(y) * w;
    const int32_t* rt = r - w;
    const int32_t* rtt = r - 2 * w;
    for (int x = 0; x < w; x++) {
      int64_t left = x ? r[x - 1] : (y ? rt[x] : 0);
      int64_t top = y ? rt[x] : left;
      int64_t topleft = (x && y) ? rt[x - 1] : left;
      int64_t topright = (x + 1 < w && y) ? rt[x + 1] : top;
      int64_t leftleft = x > 1 ? r[x - 2] : left;
      int64_t toptop = y > 1 ? rtt[x] : top;
      int64_t trr = (x + 2 < w && y) ? rt[x + 2] : topright;

      props[3] = x;
      if (needed & (1u << 4)) props[4] = std::llabs(top);
      if (needed & (1u << 5)) props[5] = std::llabs(left);
      props[6] = top;
      props[7] = left;
      if (need89) {
        props[8] = left - props[9];
        props[9] = left + top - topleft;
      }
      if (needed & (1u << 10)) props[10] = left - topleft;
      if (needed & (1u << 11)) props[11] = topleft - top;
      if (needed & (1u << 12)) props[12] = top - topright;
      if (needed & (1u << 13)) props[13] = top - toptop;
      if (needed & (1u << 14)) props[14] = left - leftleft;

      int64_t wp_pred = 0;
      if (wp) {
        int64_t max_err;
        wp_pred = wp->predict(x, y, top, left, topright, topleft, toptop,
                              &max_err);
        props[kWpProp] = max_err;
      }
      if (num_ref > 0) {
        for (int i = 0; i < num_ref; i++) {
          props[kNumNonrefProps + i] =
              i < static_cast<int>(refs.sources.size()) * 4
                  ? refs.rows[i * refs.w + x]
                  : 0;
        }
      }

      const TreeNode* leafp;
      if (ladder_prop >= 0) {
        const int64_t v = props[ladder_prop];
        size_t idx = 0;
        for (size_t i = 0; i < nbounds; i++) idx += (bptr[i] < v);
        leafp = &rtree[lad_leaves[idx]];
      } else {
        // Tree lookup over the row-simplified tree.
        int pos = 0;
        while (rtree[pos].property >= 0) {
          pos = props[rtree[pos].property] > rtree[pos].splitval
                    ? rtree[pos].lchild
                    : rtree[pos].rchild;
        }
        leafp = &rtree[pos];
      }
      const TreeNode& leaf = *leafp;
      int64_t guess = predict_one(leaf.predictor, left, top, toptop, topleft,
                                  topright, leftleft, trr, wp_pred)
                      + leaf.offset;
      uint32_t v = ans.read_clustered(ans.context_map[leaf.lchild]);
      int64_t val = static_cast<int64_t>(unpack_signed(v)) * leaf.multiplier
                    + guess;
      r[x] = static_cast<int32_t>(val);
      if (wp) wp->update_errors(val, x, y);
    }
  }
  delete wp;
  return h->br.overread ? -1 : 0;
}

// ---------------------------------------------------------------------------
// Modular encode: token generation (context, packed value) per channel.
// Tokens appended to out_ctx/out_val; returns new count or negative.

int64_t mod_encode_channel(ChannelDesc* chans, int num_chans, int chan_idx,
                           int group_id, const TreeNode* tree, int num_nodes,
                           const WpHeader* wp_header,
                           int32_t* out_ctx, uint32_t* out_val,
                           int64_t out_capacity) {
  ChannelDesc& ch = chans[chan_idx];
  const int w = ch.w, hgt = ch.h;
  if (w == 0 || hgt == 0) return 0;
  int64_t count = 0;

  int max_prop = -1;
  bool use_wp = false;
  for (int i = 0; i < num_nodes; i++) {
    max_prop = std::max(max_prop, tree[i].property);
    if (tree[i].property == kWpProp) use_wp = true;
    if (tree[i].property == -1 && tree[i].predictor == 6) use_wp = true;
  }
  const int num_props = std::max(max_prop + 1, kNumNonrefProps);
  const int num_ref = num_props - kNumNonrefProps;

  if (static_cast<int64_t>(w) * hgt > out_capacity) return -2;

  // Fast path: single-leaf tree with a simple predictor (the fixed
  // fast-lossless tree) — no property vector, no tree walk, no WP.
  if (num_nodes == 1 && tree[0].property < 0 && !use_wp &&
      tree[0].multiplier == 1 && tree[0].offset == 0 &&
      tree[0].predictor == 5 /* gradient */) {
    const int32_t ctx = tree[0].lchild;
    for (int y = 0; y < hgt; y++) {
      int32_t* r = ch.data + static_cast<int64_t>(y) * w;
      const int32_t* rt = r - w;
      for (int x = 0; x < w; x++) {
        int64_t left = x ? r[x - 1] : (y ? rt[x] : 0);
        int64_t top = y ? rt[x] : left;
        int64_t topleft = (x && y) ? rt[x - 1] : left;
        int64_t guess = clamped_gradient(left, top, topleft);
        out_ctx[count] = ctx;
        out_val[count] = pack_signed(r[x] - guess);
        count++;
      }
    }
    return count;
  }

  std::vector<int64_t> props(num_props, 0);
  props[0] = chan_idx;
  props[1] = group_id;
  WpState* wp = use_wp ? new WpState(*wp_header, w) : nullptr;
  RefProps refs;
  if (num_ref > 0) refs.init(chans, chan_idx, num_ref);

  // Resolve channel-constant splits once, row-constant splits per row.
  std::vector<TreeNode> tree_c0, tree_c, tree_row;
  tree_c0.reserve(num_nodes);
  copy_simplified(tree, 0, 0, chan_idx, tree_c0);
  tree_c.reserve(tree_c0.size());
  copy_simplified(tree_c0.data(), 0, 1, group_id, tree_c);

  for (int y = 0; y < hgt; y++) {
    props[2] = y;
    props[9] = 0;
    if (num_ref > 0) refs.compute_row(y);
    tree_row.clear();
    copy_simplified(tree_c.data(), 0, 2, y, tree_row);
    const TreeNode* rtree = tree_row.data();
    int32_t* r = ch.data + static_cast<int64_t>(y) * w;
    const int32_t* rt = r - w;
    const int32_t* rtt = r - 2 * w;
    for (int x = 0; x < w; x++) {
      int64_t left = x ? r[x - 1] : (y ? rt[x] : 0);
      int64_t top = y ? rt[x] : left;
      int64_t topleft = (x && y) ? rt[x - 1] : left;
      int64_t topright = (x + 1 < w && y) ? rt[x + 1] : top;
      int64_t leftleft = x > 1 ? r[x - 2] : left;
      int64_t toptop = y > 1 ? rtt[x] : top;
      int64_t trr = (x + 2 < w && y) ? rt[x + 2] : topright;

      props[3] = x;
      props[4] = std::llabs(top);
      props[5] = std::llabs(left);
      props[6] = top;
      props[7] = left;
      props[8] = left - props[9];
      props[9] = left + top - topleft;
      props[10] = left - topleft;
      props[11] = topleft - top;
      props[12] = top - topright;
      props[13] = top - toptop;
      props[14] = left - leftleft;

      int64_t wp_pred = 0;
      if (wp) {
        int64_t max_err;
        wp_pred = wp->predict(x, y, top, left, topright, topleft, toptop,
                              &max_err);
        props[kWpProp] = max_err;
      }
      if (num_ref > 0) {
        for (int i = 0; i < num_ref; i++) {
          props[kNumNonrefProps + i] =
              i < static_cast<int>(refs.sources.size()) * 4
                  ? refs.rows[i * refs.w + x]
                  : 0;
        }
      }

      int pos = 0;
      while (tree[pos].property >= 0) {
        pos = props[tree[pos].property] > tree[pos].splitval
                  ? tree[pos].lchild
                  : tree[pos].rchild;
      }
      const TreeNode& leaf = tree[pos];
      int64_t guess = predict_one(leaf.predictor, left, top, toptop, topleft,
                                  topright, leftleft, trr, wp_pred)
                      + leaf.offset;
      int64_t val = r[x];
      int64_t residual = val - guess;
      if (leaf.multiplier != 1) {
        residual /= leaf.multiplier;  // caller guarantees divisibility
      }
      out_ctx[count] = leaf.lchild;
      out_val[count] = pack_signed(residual);
      count++;
      if (wp) wp->update_errors(val, x, y);
    }
  }
  delete wp;
  return count;
}

// ---------------------------------------------------------------------------
// Sub-8x8 ACS cost model (enc_ac_strategy.cc FindBest8x8Transform): the
// per-coefficient quantize/entropy pass and the per-pixel masked-error
// pass, fused per block. The two 64x64 transforms between them stay in
// BLAS (numpy float32 matmul) — C++ owns only the elementwise soup that
// dominated the numpy formulation with (nblocks, 64) temporaries.

extern "C" {

// coef: [3][n][64] candidate-space coefficients. Emits diff*mat into
// diffm ([3][n][64]) and the per-block entropy term into entropy [n].
void acs_sub8x8_stage1(int64_t n, const float* coef, const float* quant,
                       const float* inv_mat /*[3][64]*/,
                       const float* mat /*[3][64]*/,
                       const float* cmap_factors /*[3]*/,
                       float zeros_mul, float cost_delta,
                       float* diffm, float* entropy) {
  for (int64_t b = 0; b < n; b++) entropy[b] = 0.f;
  for (int c = 0; c < 3; c++) {
    const float cf = cmap_factors[c];
    const float* im = inv_mat + c * 64;
    const float* mm = mat + c * 64;
    for (int64_t b = 0; b < n; b++) {
      const float q = quant[b];
      const float* cc = coef + (c * n + b) * 64;
      const float* cy = coef + (1 * n + b) * 64;
      float* dm = diffm + (c * n + b) * 64;
      float ent = 0.f;
      int nz = 0;
      for (int j = 0; j < 64; j++) {
        const float val = (cc[j] - cf * cy[j]) * im[j] * q;
        const float rval = nearbyintf(val);   // round-half-even = np.round
        const float diff = val - rval;
        const float aq = fabsf(rval);
        ent += sqrtf(aq);
        nz += (rval != 0.f);
        dm[j] = diff * mm[j];
      }
      // nbits = (nz > 0 ? floor(log2(nz)) + 1 : 0) + 1
      const int nbits = (nz > 0 ? (31 - __builtin_clz((unsigned)nz)) + 1
                                : 0) + 1;
      const int lb = 31 - __builtin_clz((unsigned)(nbits + 17));
      entropy[b] += cost_delta * ent
                    + zeros_mul * (float)(lb + 1 + nbits);
    }
  }
}

// errpix: [3][n][64] pixel-space quantization error. Folds the masked
// L8 information-loss norm and updates the running per-block best.
void acs_sub8x8_stage2(int64_t n, const float* errpix, const float* masku,
                       const float* masku_off /*[3]*/,
                       const float* channel_mul /*[3]*/,
                       const float* quant, const float* entropy,
                       float entropy_mul, float info_loss_multiplier,
                       int32_t cand_id, float* best_cost,
                       int32_t* best_s) {
  for (int64_t b = 0; b < n; b++) {
    double loss = 0.0;
    const float* mrow = masku + b * 64;
    for (int c = 0; c < 3; c++) {
      const float off = masku_off[c];
      const float cm = channel_mul[c];
      const float* er = errpix + (c * n + b) * 64;
      float acc = 0.f;
      for (int j = 0; j < 64; j++) {
        const float e = (mrow[j] + off) * er[j];
        const float e2 = e * e;
        const float e4 = e2 * e2;
        acc += e4 * e4;
      }
      loss += (double)cm * acc;
    }
    const float loss_scalar =
        (float)(pow(loss / 64.0, 0.125) * 64.0) / quant[b];
    const float cost = entropy[b] * entropy_mul
                       + info_loss_multiplier * loss_scalar;
    if (cost < best_cost[b]) {
      best_cost[b] = cost;
      best_s[b] = cand_id;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused host dequant: AdjustQuantBias + dequant table + per-block scale
// + CfL in ONE pass over the batched coefficients (the numpy where-
// chain streams ~10 full passes over the same arrays).

extern "C" {

// coeffs: [n][3][size] int32; table [3][size]; scale [n]; fx/fb [n];
// out [n][3][size] float32. biases: (bx, by, bb, b3).
void dequant_blocks(int64_t n, int64_t size, const int32_t* coeffs,
                    const float* table, const float* scale,
                    const float* fx, const float* fb, float qmx,
                    float qmb, const double* biases, float* out) {
  const float b0 = (float)biases[0], b1 = (float)biases[1],
              b2 = (float)biases[2], b3 = (float)biases[3];
  const float bias_c[3] = {b0, b1, b2};
  const float qm[3] = {qmx, 1.0f, qmb};
  for (int64_t i = 0; i < n; i++) {
    const float sc = scale[i];
    const int32_t* blk = coeffs + i * 3 * size;
    float* o = out + i * 3 * size;
    // Y first (X/B need the dequantized Y for CfL).
    for (int c : {1, 0, 2}) {
      const float* tb = table + c * size;
      const int32_t* in = blk + c * size;
      float* oc = o + c * size;
      const float bc = bias_c[c];
      const float q = qm[c];
      for (int64_t j = 0; j < size; j++) {
        const float x = (float)in[j];
        float biased;
        if (in[j] == 0) biased = 0.0f;
        else if (in[j] == 1) biased = bc;
        else if (in[j] == -1) biased = -bc;
        else biased = x - b3 / x;
        // Same association order as the numpy chain (bit-stable).
        oc[j] = ((biased * tb[j]) * sc) * q;
      }
      if (c == 0) {
        const float f = fx[i];
        const float* y = o + size;
        for (int64_t j = 0; j < size; j++) oc[j] += f * y[j];
      } else if (c == 2) {
        const float f = fb[i];
        const float* y = o + size;
        for (int64_t j = 0; j < size; j++) oc[j] += f * y[j];
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Host loop filters (render_pipeline/stage_gaborish.cc + stage_epf.cc
// semantics, matching pipeline/loop_filters.py's whole-image numpy
// formulation): fused single-pass C++ replaces ~40 full-image numpy
// temporaries per EPF pass on the one-core host decode path.

static void mirror_pad_3(const float* img, int64_t h, int64_t w, int r,
                         std::vector<float>& out) {
  // np.pad mode="symmetric": edge sample repeats ([a b] -> [a a b b]).
  const int64_t ph = h + 2 * r, pw = w + 2 * r;
  out.assign(3 * ph * pw, 0.f);
  for (int c = 0; c < 3; c++) {
    const float* src = img + c * h * w;
    float* dst = out.data() + c * ph * pw;
    for (int64_t y = 0; y < ph; y++) {
      int64_t sy = y - r;
      if (sy < 0) sy = -sy - 1;
      if (sy >= h) sy = 2 * h - 1 - sy;
      const float* srow = src + sy * w;
      float* drow = dst + y * pw;
      for (int64_t x = 0; x < r; x++) drow[x] = srow[r - 1 - x];
      std::memcpy(drow + r, srow, w * sizeof(float));
      for (int64_t x = 0; x < r; x++) drow[r + w + x] = srow[w - 1 - x];
    }
  }
}

extern "C" {

// Normalized 3x3 gaborish (stage_gaborish.cc): weights[c] = (w1, w2).
void host_gaborish(const float* img, float* out, int64_t h, int64_t w,
                   const double* weights) {
  std::vector<float> pad;
  mirror_pad_3(img, h, w, 1, pad);
  const int64_t pw = w + 2;
  for (int c = 0; c < 3; c++) {
    const double div = 1.0 + 4.0 * (weights[c * 2] + weights[c * 2 + 1]);
    const float w0 = (float)(1.0 / div);
    const float w1 = (float)(weights[c * 2] / div);
    const float w2 = (float)(weights[c * 2 + 1] / div);
    const float* p = pad.data() + c * (h + 2) * pw;
    float* o = out + c * h * w;
    for (int64_t y = 0; y < h; y++) {
      const float* r0 = p + y * pw;
      const float* r1 = r0 + pw;
      const float* r2 = r1 + pw;
      float* orow = o + y * w;
      for (int64_t x = 0; x < w; x++) {
        orow[x] = r1[x + 1] * w0
                  + (r1[x] + r1[x + 2] + r0[x + 1] + r2[x + 1]) * w1
                  + (r0[x] + r0[x + 2] + r2[x] + r2[x + 2]) * w2;
      }
    }
  }
}

}  // extern "C"

namespace {

constexpr double kMinSigmaC = -3.90524291751269967465540850526868;

// Per-pixel inv_sigma row for one image row (block expand * border map).
static inline void isig_row(const float* isb, int64_t bw, int64_t y,
                            int64_t w, float sm, float bsm, float* row) {
  const float* brow = isb + (y >> 3) * bw;
  const bool ybord = (y & 7) == 0 || (y & 7) == 7;
  for (int64_t x = 0; x < w; x++) {
    const bool bord = ybord || (x & 7) == 0 || (x & 7) == 7;
    row[x] = brow[x >> 3] * (bord ? bsm : sm);
  }
}

// One EPF pass with plus-shaped SADs over `ncand` candidate offsets.
// rad: padding radius (3 for EPF0, 2 for EPF1). Exactly mirrors
// loop_filters.py epf0/epf1.
static void epf_plus_pass(const float* img, float* out, int64_t h,
                          int64_t w, const float* isb, int64_t bh,
                          int64_t bw, float sm, float bsm,
                          const float* cscale, const int (*cands)[2],
                          int ncand, int rad) {
  (void)bh;
  std::vector<float> pad;
  mirror_pad_3(img, h, w, rad, pad);
  const int64_t ph = h + 2 * rad, pw = w + 2 * rad;
  const float* P[3] = {pad.data(), pad.data() + ph * pw,
                       pad.data() + 2 * ph * pw};
  // Running accumulators.
  std::vector<float> acc(3 * h * w);
  std::vector<float> wsum(h * w, 1.0f);
  std::memcpy(acc.data(), img, 3 * h * w * sizeof(float));
  // Candidate diff field E over [(rad-1)..(rad+h+1)) x likewise.
  const int64_t eh = h + 2, ew = w + 2;
  std::vector<float> E(eh * ew);
  // Per-pixel sigma rows are candidate-independent: hoist out of the
  // candidate loop (same values, ncand x fewer recomputes).
  std::vector<float> isig_all(h * w);
  for (int64_t y = 0; y < h; y++)
    isig_row(isb, bw, y, w, sm, bsm, isig_all.data() + y * w);
  for (int ci = 0; ci < ncand; ci++) {
    const int sy = cands[ci][0], sx = cands[ci][1];
    for (int64_t u = 0; u < eh; u++) {
      const int64_t py = rad - 1 + u;
      float* erow = E.data() + u * ew;
      const float* a0 = P[0] + py * pw + (rad - 1);
      const float* b0 = P[0] + (py + sy) * pw + (rad - 1 + sx);
      const float* a1 = P[1] + py * pw + (rad - 1);
      const float* b1 = P[1] + (py + sy) * pw + (rad - 1 + sx);
      const float* a2 = P[2] + py * pw + (rad - 1);
      const float* b2 = P[2] + (py + sy) * pw + (rad - 1 + sx);
      for (int64_t v = 0; v < ew; v++) {
        erow[v] = cscale[0] * std::fabs(a0[v] - b0[v])
                  + cscale[1] * std::fabs(a1[v] - b1[v])
                  + cscale[2] * std::fabs(a2[v] - b2[v]);
      }
    }
    for (int64_t y = 0; y < h; y++) {
      const float* isig = isig_all.data() + y * w;
      const float* e0 = E.data() + y * ew + 1;        // (y-1, x)
      const float* e1 = E.data() + (y + 1) * ew;      // (y, x-1)
      const float* e1c = e1 + 1;                      // (y, x)
      const float* e1r = e1 + 2;                      // (y, x+1)
      const float* e2 = E.data() + (y + 2) * ew + 1;  // (y+1, x)
      const float* c0 = P[0] + (rad + y + sy) * pw + rad + sx;
      const float* c1 = P[1] + (rad + y + sy) * pw + rad + sx;
      const float* c2 = P[2] + (rad + y + sy) * pw + rad + sx;
      float* a0 = acc.data() + y * w;
      float* a1r = acc.data() + h * w + y * w;
      float* a2r = acc.data() + 2 * h * w + y * w;
      float* ws = wsum.data() + y * w;
      for (int64_t x = 0; x < w; x++) {
        const float sad = e0[x] + e1[x] + e1c[x] + e1r[x] + e2[x];
        float wgt = sad * isig[x] + 1.0f;
        wgt = wgt > 0.f ? wgt : 0.f;
        a0[x] += wgt * c0[x];
        a1r[x] += wgt * c1[x];
        a2r[x] += wgt * c2[x];
        ws[x] += wgt;
      }
    }
  }
  // Normalize; skip blocks whose raw inv_sigma < MIN_SIGMA.
  for (int64_t y = 0; y < h; y++) {
    const float* brow = isb + (y >> 3) * bw;
    const float* ws = wsum.data() + y * w;
    for (int c = 0; c < 3; c++) {
      const float* a = acc.data() + c * h * w + y * w;
      const float* src = img + c * h * w + y * w;
      float* o = out + c * h * w + y * w;
      for (int64_t x = 0; x < w; x++) {
        const bool skip = brow[x >> 3] < (float)kMinSigmaC;
        o[x] = skip ? src[x] : a[x] / ws[x];
      }
    }
  }
}

}  // namespace

extern "C" {

// Full EPF sequence (dec_cache.cc order: EPF0 if iters>=3, EPF1 if
// >=1, EPF2 if >=2) in place over `img` -> `out` (may alias only via
// distinct buffers; caller passes separate in/out).
void host_epf(const float* img, float* out, int64_t h, int64_t w,
              const float* inv_sigma_blocks, int64_t bh, int64_t bw,
              int iters, double pass0_scale, double pass2_scale,
              double border_mul, const double* channel_scale) {
  const float cs[3] = {(float)channel_scale[0], (float)channel_scale[1],
                       (float)channel_scale[2]};
  static const int cands0[12][2] = {
      {-2, 0}, {-1, -1}, {-1, 0}, {-1, 1}, {0, -2}, {0, -1},
      {0, 1}, {0, 2}, {1, -1}, {1, 0}, {1, 1}, {2, 0}};
  static const int cands1[4][2] = {{-1, 0}, {0, -1}, {0, 1}, {1, 0}};
  std::vector<float> tmp;
  const float* cur = img;
  float* nxt = out;
  std::vector<float> scratch;
  if (iters >= 3) {
    const float sm = (float)(pass0_scale * 1.65);
    epf_plus_pass(cur, nxt, h, w, inv_sigma_blocks, bh, bw, sm,
                  (float)(sm * border_mul), cs, cands0, 12, 3);
    scratch.assign(nxt, nxt + 3 * h * w);
    cur = scratch.data();
  }
  if (iters >= 1) {
    const float sm = 1.65f;
    epf_plus_pass(cur, nxt, h, w, inv_sigma_blocks, bh, bw, sm,
                  (float)(sm * border_mul), cs, cands1, 4, 2);
    if (iters >= 2) {
      if (scratch.empty()) scratch.resize(3 * h * w);
      std::memcpy(scratch.data(), nxt, 3 * h * w * sizeof(float));
      cur = scratch.data();
    }
  }
  if (iters >= 2) {
    // EPF2: 3x3, single-pixel SADs vs the pass input center.
    const float sm = (float)(pass2_scale * 1.65);
    const float bsm = (float)(sm * border_mul);
    std::vector<float> pad;
    mirror_pad_3(cur, h, w, 1, pad);
    const int64_t pw = w + 2, phh = h + 2;
    const float* P[3] = {pad.data(), pad.data() + phh * pw,
                         pad.data() + 2 * phh * pw};
    std::vector<float> isig(w);
    for (int64_t y = 0; y < h; y++) {
      isig_row(inv_sigma_blocks, bw, y, w, sm, bsm, isig.data());
      const float* brow = inv_sigma_blocks + (y >> 3) * bw;
      const float* ctr[3] = {cur + y * w, cur + h * w + y * w,
                             cur + 2 * h * w + y * w};
      float* orow[3] = {out + y * w, out + h * w + y * w,
                        out + 2 * h * w + y * w};
      for (int64_t x = 0; x < w; x++) {
        float a0 = ctr[0][x], a1 = ctr[1][x], a2 = ctr[2][x];
        float x0 = a0, x1 = a1, x2 = a2, ws = 1.0f;
        for (int ci = 0; ci < 4; ci++) {
          const int sy = cands1[ci][0], sx = cands1[ci][1];
          const float q0 = P[0][(1 + y + sy) * pw + 1 + x + sx];
          const float q1 = P[1][(1 + y + sy) * pw + 1 + x + sx];
          const float q2 = P[2][(1 + y + sy) * pw + 1 + x + sx];
          const float sad = cs[0] * std::fabs(q0 - a0)
                            + cs[1] * std::fabs(q1 - a1)
                            + cs[2] * std::fabs(q2 - a2);
          float wgt = sad * isig[x] + 1.0f;
          wgt = wgt > 0.f ? wgt : 0.f;
          x0 += wgt * q0;
          x1 += wgt * q1;
          x2 += wgt * q2;
          ws += wgt;
        }
        const bool skip = brow[x >> 3] < (float)kMinSigmaC;
        orow[0][x] = skip ? a0 : x0 / ws;
        orow[1][x] = skip ? a1 : x1 / ws;
        orow[2][x] = skip ? a2 : x2 / ws;
      }
    }
  }
  if (iters == 0) {
    std::memcpy(out, img, 3 * h * w * sizeof(float));
  }
  (void)tmp;
}

// Fused XYB -> linear RGB -> sRGB -> quantized interleaved pixels
// (dec_xyb-inl.h XybToRgb + TF_SRGB encode + round/clip). The sRGB
// OETF is a 4096-entry sqrt-warped lerp LUT (max abs err < 2e-6,
// far inside the 8/16-bit quantum).
void xyb_to_srgb_px(const float* xyb, int64_t n, const double* inv_mat,
                    const double* bias, uint8_t* out8, uint16_t* out16,
                    int32_t maxval) {
  static float lut[4098];
  static bool init = false;
  if (!init) {
    for (int i = 0; i <= 4097; i++) {
      double t = (double)i / 4096.0;
      double lin = t * t;
      lut[i] = (float)(lin <= 0.0031308
                           ? lin * 12.92
                           : 1.055 * pow(lin, 1.0 / 2.4) - 0.055);
    }
    init = true;
  }
  const float bc0 = (float)cbrt(bias[0]);
  const float bc1 = (float)cbrt(bias[1]);
  const float bc2 = (float)cbrt(bias[2]);
  float m[9];
  for (int i = 0; i < 9; i++) m[i] = (float)inv_mat[i];
  const float b0 = (float)bias[0], b1 = (float)bias[1],
              b2 = (float)bias[2];
  const float* X = xyb;
  const float* Y = xyb + n;
  const float* B = xyb + 2 * n;
  const float mv = (float)maxval;
  // Chunked: the cube + 3x3 matmul + clamp + sqrt stage runs over
  // planar chunk buffers (auto-vectorizes); only the LUT gather +
  // interleaved store stays scalar. Element-wise math is unchanged,
  // so outputs are bit-identical to the fused scalar loop.
  constexpr int CH = 256;
  float t3[3][CH];
  for (int64_t i0 = 0; i0 < n; i0 += CH) {
    const int cnt = (int)(n - i0 < CH ? n - i0 : CH);
    for (int j = 0; j < cnt; j++) {
      const int64_t i = i0 + j;
      const float gl = Y[i] + X[i] + bc0;
      const float gm = Y[i] - X[i] + bc1;
      const float gs = B[i] + bc2;
      const float L = gl * gl * gl - b0;
      const float M = gm * gm * gm - b1;
      const float S = gs * gs * gs - b2;
      float v0 = m[0] * L + m[1] * M + m[2] * S;
      float v1 = m[3] * L + m[4] * M + m[5] * S;
      float v2 = m[6] * L + m[7] * M + m[8] * S;
      v0 = v0 < 0.f ? 0.f : (v0 > 1.f ? 1.f : v0);
      v1 = v1 < 0.f ? 0.f : (v1 > 1.f ? 1.f : v1);
      v2 = v2 < 0.f ? 0.f : (v2 > 1.f ? 1.f : v2);
      t3[0][j] = std::sqrt(v0) * 4096.0f;
      t3[1][j] = std::sqrt(v1) * 4096.0f;
      t3[2][j] = std::sqrt(v2) * 4096.0f;
    }
    for (int j = 0; j < cnt; j++) {
      const int64_t i = i0 + j;
      for (int c = 0; c < 3; c++) {
        const float t = t3[c][j];
        const int idx = (int)t;
        const float fr = t - (float)idx;
        const float enc = lut[idx] + (lut[idx + 1] - lut[idx]) * fr;
        float q = nearbyintf(enc * mv);
        q = q < 0.f ? 0.f : (q > mv ? mv : q);
        if (out8) out8[i * 3 + c] = (uint8_t)q;
        else out16[i * 3 + c] = (uint16_t)q;
      }
    }
  }
}

}  // extern "C"

extern "C" {

// Precise CfL multiplier fit (enc_chroma_from_luma.cc CFLFunction):
// Newton steps on the robust saturated-L1 cost; a/b are the weighted
// luma/residual arrays the Python caller prepares per tile.
int32_t cfl_find_multiplier(const double* a, const double* b, int64_t n,
                            double distance_mul) {
  if (n == 0) return 0;
  const double kc = (1.0 / 3) * 2.0;
  const double thres = 100.0, eps = 100.0;
  double x = 0.0;
  for (int it = 0; it < 20; it++) {
    double d0 = 0, dp = 0, dm = 0;
    // Branchless so the compiler vectorizes (the saturation test is an
    // unpredictable data-dependent branch otherwise).
    for (int64_t i = 0; i < n; i++) {
      const double ai = a[i];
      const double v = ai * x + b[i];
      const double av = std::fabs(v);
      const double d = av < thres ? kc * ai : 0.0;
      const double ae = ai * eps;
      const double vp = v + ae, vm = v - ae;
      d0 += (v < 0 ? -1.0 : 1.0) * d * (av + 1.0);
      dp += (vp < 0 ? -1.0 : 1.0) * d * (std::fabs(vp) + 1.0);
      dm += (vm < 0 ? -1.0 : 1.0) * d * (std::fabs(vm) + 1.0);
    }
    const double reg = 2.0 * distance_mul * (double)n;
    const double fd = reg * x + d0;
    const double fpe = reg * (x + eps) + dp;
    const double fme = reg * (x - eps) + dm;
    const double ddf = (fpe - fme) / (2.0 * eps);
    double step = fd / (ddf + 0.85);
    step = std::min(20.0, std::max(-20.0, step));
    x -= step;
    if (std::fabs(step) < 3e-3) break;
  }
  const double tz = 2.6;
  if (x >= tz) x -= tz;
  else if (x <= -tz) x += tz;
  else x = 0.0;
  double r = nearbyint(x);   // round-half-even, like Python round()
  r = std::min(127.0, std::max(-128.0, r));
  return (int32_t)r;
}

// Whole-map CfL fit (enc_chroma_from_luma.cc ComputeTile over every
// 64x64 tile): a/b are (BY, BX, 64) row-major weighted coefficient
// planes; each 8x8-block tile's pairs are gathered and passed through
// the same Newton fit as cfl_find_multiplier. Replaces a per-tile
// Python slicing loop (192 calls/frame on a 768x512 input).
void cfl_fit_tiles(const double* a, const double* b, int64_t by,
                   int64_t bx, double distance_mul, int32_t* out) {
  const int64_t ty = (by + 7) / 8, tx = (bx + 7) / 8;
  std::vector<double> ta(8 * 8 * 64), tb(8 * 8 * 64);
  for (int64_t t_y = 0; t_y < ty; t_y++) {
    const int64_t y0 = t_y * 8, y1 = std::min(y0 + 8, by);
    for (int64_t t_x = 0; t_x < tx; t_x++) {
      const int64_t x0 = t_x * 8, x1 = std::min(x0 + 8, bx);
      int64_t n = 0;
      for (int64_t y = y0; y < y1; y++) {
        const double* ra = a + (y * bx + x0) * 64;
        const double* rb = b + (y * bx + x0) * 64;
        const int64_t m = (x1 - x0) * 64;
        std::copy(ra, ra + m, ta.data() + n);
        std::copy(rb, rb + m, tb.data() + n);
        n += m;
      }
      out[t_y * tx + t_x] =
          cfl_find_multiplier(ta.data(), tb.data(), n, distance_mul);
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// LSB-first bit sink with a 64-bit accumulator (out buffer must be
// zeroed by the caller; n <= 56 per put).

struct BitSink {
  uint8_t* out;
  int64_t cap_bits;
  uint64_t acc = 0;
  uint32_t nacc = 0;
  int64_t byte_pos = 0;

  inline bool put(uint64_t v, uint32_t n) {
    if (n == 0) return true;
    if ((byte_pos << 3) + nacc + n > static_cast<uint64_t>(cap_bits))
      return false;
    acc |= (v & ((1ull << n) - 1)) << nacc;
    nacc += n;
    while (nacc >= 8) {
      out[byte_pos++] = static_cast<uint8_t>(acc);
      acc >>= 8;
      nacc -= 8;
    }
    return true;
  }
  // Total bits written; flushes the partial byte (harmless: buffer is
  // zeroed and callers only consume `bits` bits).
  int64_t finish() {
    int64_t bits = (byte_pos << 3) + nacc;
    if (nacc) out[byte_pos] = static_cast<uint8_t>(acc);
    return bits;
  }
};

inline void hybrid_encode(uint32_t value, uint32_t split_exponent,
                          uint32_t msb, uint32_t lsb, uint32_t* token,
                          uint32_t* nbits, uint32_t* bits) {
  uint32_t split_token = 1u << split_exponent;
  if (value < split_token) {
    *token = value;
    *nbits = 0;
    *bits = 0;
  } else {
    uint32_t n = 31 - __builtin_clz(value);
    uint32_t m = value - (1u << n);
    *token = split_token + ((n - split_exponent) << (msb + lsb)) +
             ((m >> (n - msb)) << lsb) + (m & ((1u << lsb) - 1));
    *nbits = n - msb - lsb;
    *bits = (value >> lsb) & ((1u << *nbits) - 1);
  }
}

// ---------------------------------------------------------------------------
// ANS token stream writer (enc_ans.cc WriteTokens): encodes tokens in
// reverse with per-cluster frequency/reverse-map tables, emits bits.

// freqs: [clusters][alpha] uint16; reverse maps flattened with offsets.
int64_t ans_write_tokens(
    const int32_t* ctxs, const uint32_t* values, int64_t num_tokens,
    const uint8_t* context_map, const int32_t* uint_cfgs, int num_clusters,
    const uint32_t* freqs, const uint32_t* rmap, const uint32_t* rmap_off,
    int alpha_size, uint8_t* out, int64_t out_capacity_bits,
    int64_t* out_bits_used) {
  // First pass (reverse): compute ans bits.
  struct Chunk { uint32_t bits; uint8_t n; };
  std::vector<Chunk> chunks;
  chunks.reserve(2 * num_tokens);
  uint32_t state = kAnsSignature << 16;
  for (int64_t i = num_tokens - 1; i >= 0; i--) {
    uint32_t cluster = context_map[ctxs[i]];
    const int32_t* c = uint_cfgs + cluster * 3;
    uint32_t split_exponent = c[0], msb = c[1], lsb = c[2];
    uint32_t split_token = 1u << split_exponent;
    uint32_t value = values[i];
    uint32_t token, nbits, bits;
    if (value < split_token) {
      token = value; nbits = 0; bits = 0;
    } else {
      uint32_t n = 31 - __builtin_clz(value);
      uint32_t m = value - (1u << n);
      token = split_token + ((n - split_exponent) << (msb + lsb))
              + ((m >> (n - msb)) << lsb) + (m & ((1u << lsb) - 1));
      nbits = n - msb - lsb;
      bits = (value >> lsb) & ((1u << nbits) - 1);
    }
    if (token >= static_cast<uint32_t>(alpha_size)) return -3;
    chunks.push_back({bits, static_cast<uint8_t>(nbits)});
    // PutSymbol
    uint32_t freq = freqs[cluster * alpha_size + token];
    if (freq == 0) return -4;
    uint32_t ans_bits = 0; uint8_t ans_n = 0;
    if ((state >> (32 - kAnsLogTabSize)) >= freq) {
      ans_bits = state & 0xFFFF;
      ans_n = 16;
      state >>= 16;
    }
    state = ((state / freq) << kAnsLogTabSize)
            + rmap[rmap_off[cluster * alpha_size + token] + (state % freq)];
    chunks.push_back({ans_bits, ans_n});
  }
  // Emit: 32-bit state then chunks reversed.
  BitSink sink{out, out_capacity_bits};
  if (!sink.put(state, 32)) return -5;
  for (int64_t i = chunks.size() - 1; i >= 0; i--) {
    if (!sink.put(chunks[i].bits, chunks[i].n)) return -5;
  }
  *out_bits_used = sink.finish();
  return 0;
}

// ---------------------------------------------------------------------------
// Prefix-code token stream writer (forward order, no final state): the
// fast-lossless (effort<=2) entropy backend, mirroring the reference's
// enc_fast_lossless.cc choice of prefix codes over ANS. depths/codes:
// [clusters][alpha] canonical-Huffman bit lengths and LSB-first code
// words (PrefixCode.depths/.bits layout from entropy/prefix.py).

int64_t prefix_write_tokens(
    const int32_t* ctxs, const uint32_t* values, int64_t num_tokens,
    const uint8_t* context_map, const int32_t* uint_cfgs, int num_clusters,
    const uint8_t* depths, const uint16_t* codes, int alpha_size,
    uint8_t* out, int64_t out_capacity_bits, int64_t* out_bits_used) {
  (void)num_clusters;
  BitSink sink{out, out_capacity_bits};
  for (int64_t i = 0; i < num_tokens; i++) {
    uint32_t cluster = context_map[ctxs[i]];
    const int32_t* c = uint_cfgs + cluster * 3;
    uint32_t token, nbits, bits;
    hybrid_encode(values[i], c[0], c[1], c[2], &token, &nbits, &bits);
    if (token >= static_cast<uint32_t>(alpha_size)) return -3;
    const int64_t slot = static_cast<int64_t>(cluster) * alpha_size + token;
    // Single-symbol alphabets have depth 0 (nothing emitted), matching
    // the decoder's degenerate-code handling.
    if (!sink.put(codes[slot], depths[slot])) return -5;
    if (!sink.put(bits, nbits)) return -5;
  }
  *out_bits_used = sink.finish();
  return 0;
}

// Token histograms over raw (ctx, value) streams with one shared hybrid
// -uint config (pre-clustering stage of BuildAndEncodeHistograms).
// hist: [num_contexts][alpha_size] int64, zeroed by the caller.
// Returns the max token seen, or negative on overflow.

int64_t token_histogram(const int32_t* ctxs, const uint32_t* values,
                        int64_t n, int split_exponent, int msb, int lsb,
                        int64_t* hist, int num_contexts, int alpha_size) {
  int64_t max_token = -1;
  for (int64_t i = 0; i < n; i++) {
    uint32_t token, nbits, bits;
    hybrid_encode(values[i], split_exponent, msb, lsb, &token, &nbits,
                  &bits);
    if (token >= static_cast<uint32_t>(alpha_size)) return -3;
    if (ctxs[i] < 0 || ctxs[i] >= num_contexts) return -2;
    hist[static_cast<int64_t>(ctxs[i]) * alpha_size + token]++;
    if (static_cast<int64_t>(token) > max_token)
      max_token = static_cast<int64_t>(token);
  }
  return max_token;
}

// rct.cc arithmetic: inverse (stored -> original) on three equal-size
// int32 planes in place; the caller applies the channel permutation by
// reassigning plane references. int64 intermediates match the Python
// oracle's astype(int64) -> int32 cast.
void inv_rct3(int32_t* c0, int32_t* c1, int32_t* c2, int64_t n,
              int custom) {
  if (custom == 6) {  // YCoCg
    for (int64_t i = 0; i < n; i++) {
      int64_t y = c0[i], co = c1[i], cg = c2[i];
      int64_t tmp = y - (cg >> 1);
      int64_t g = cg + tmp;
      int64_t bb = tmp - (co >> 1);
      c0[i] = static_cast<int32_t>(bb + co);
      c1[i] = static_cast<int32_t>(g);
      c2[i] = static_cast<int32_t>(bb);
    }
    return;
  }
  const int second = custom >> 1, third = custom & 1;
  for (int64_t i = 0; i < n; i++) {
    int64_t f = c0[i], s = c1[i], t = c2[i];
    if (third) t += f;
    if (second == 1) {
      s += f;
    } else if (second == 2) {
      s += (f + t) >> 1;
    }
    c1[i] = static_cast<int32_t>(s);
    c2[i] = static_cast<int32_t>(t);
  }
}

// Forward RCT (original -> stored), inverse of inv_rct3.
void fwd_rct3(int32_t* c0, int32_t* c1, int32_t* c2, int64_t n,
              int custom) {
  if (custom == 6) {  // YCoCg: inputs r, g, b
    for (int64_t i = 0; i < n; i++) {
      int64_t r = c0[i], g = c1[i], bb = c2[i];
      int64_t co = r - bb;
      int64_t tmp = bb + (co >> 1);
      int64_t cg = g - tmp;
      c0[i] = static_cast<int32_t>(tmp + (cg >> 1));
      c1[i] = static_cast<int32_t>(co);
      c2[i] = static_cast<int32_t>(cg);
    }
    return;
  }
  const int second = custom >> 1, third = custom & 1;
  for (int64_t i = 0; i < n; i++) {
    int64_t f = c0[i], s = c1[i], t = c2[i];
    if (second == 1) {
      s -= f;
    } else if (second == 2) {
      s -= (f + t) >> 1;
    }
    if (third) t -= f;
    c1[i] = static_cast<int32_t>(s);
    c2[i] = static_cast<int32_t>(t);
  }
}

// Fused plane interleave + clamp for final pixel output (saves a
// full-image np.stack + np.clip + astype on the host's one core).
void interleave_clip_u8(const int32_t* const* planes, int k, int64_t n,
                        int32_t maxval, uint8_t* out) {
  for (int64_t i = 0; i < n; i++) {
    for (int c = 0; c < k; c++) {
      int32_t v = planes[c][i];
      v = v < 0 ? 0 : (v > maxval ? maxval : v);
      out[i * k + c] = static_cast<uint8_t>(v);
    }
  }
}

void interleave_clip_u16(const int32_t* const* planes, int k, int64_t n,
                         int32_t maxval, uint16_t* out) {
  for (int64_t i = 0; i < n; i++) {
    for (int c = 0; c < k; c++) {
      int32_t v = planes[c][i];
      v = v < 0 ? 0 : (v > maxval ? maxval : v);
      out[i * k + c] = static_cast<uint16_t>(v);
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// VarDCT AC coefficient (de)tokenization (dec_group.cc DecodeACVarBlock,
// enc_entropy_coder.cc TokenizeCoefficients).

static const uint16_t kCoeffFreqContext[64] = {
    0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 15, 16, 16, 17, 17, 18, 18, 19, 19, 20, 20, 21, 21, 22, 22,
    23, 23, 23, 23, 24, 24, 24, 24, 25, 25, 25, 25, 26, 26, 26, 26,
    27, 27, 27, 27, 28, 28, 28, 28, 29, 29, 29, 29, 30, 30, 30, 30};

static const uint16_t kCoeffNumNonzeroContext[64] = {
    0, 0, 31, 62, 62, 93, 93, 93, 93, 123, 123, 123, 123,
    152, 152, 152, 152, 152, 152, 152, 152, 180, 180, 180, 180, 180,
    180, 180, 180, 180, 180, 180, 180, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206};

static inline uint32_t zero_density_ctx(uint32_t nonzeros_left, uint32_t k,
                                        uint32_t covered,
                                        uint32_t log2_covered, uint32_t prev) {
  nonzeros_left = (nonzeros_left + covered - 1) >> log2_covered;
  k >>= log2_covered;
  return (kCoeffNumNonzeroContext[nonzeros_left] + kCoeffFreqContext[k]) * 2
         + prev;
}

// Combined (nonzeros_left, k) -> 2*(nz_ctx + freq_ctx) table: one load
// on the per-token critical path instead of two plus an add.
struct ZdLut {
  uint16_t t[64 * 64];
  ZdLut() {
    for (int i = 0; i < 64; i++)
      for (int j = 0; j < 64; j++)
        t[(i << 6) | j] =
            (kCoeffNumNonzeroContext[i] + kCoeffFreqContext[j]) * 2;
  }
};
const ZdLut kZdLut;

static inline uint32_t zero_density_ctx_lut(uint32_t nonzeros_left,
                                            uint32_t k, uint32_t covered,
                                            uint32_t log2_covered,
                                            uint32_t prev) {
  const uint32_t i = (nonzeros_left + covered - 1) >> log2_covered;
  const uint32_t j = k >> log2_covered;
  return kZdLut.t[(i << 6) | j] + prev;
}

extern "C" {

// Per-block arrays (num_blocks entries): bx, by, cx, cy, and per channel
// block_ctx[3], order_off[3] (offsets into `orders`), coeff_off (into
// out_coeffs, 3*size each, channel-major). nzeros rows per channel over
// (bw, bh) blocks. num_ctxs = BlockCtxMap::num_ctxs;
// zero_density offsets computed natively. Returns 0 or negative error.
int vardct_decode_ac(ModularDecoderHandle* h, int bw, int bh,
                     int num_blocks, const int32_t* blk_bx,
                     const int32_t* blk_by, const int32_t* blk_cx,
                     const int32_t* blk_cy, const int32_t* blk_ctx /*3/blk*/,
                     const int32_t* blk_order_off /*3/blk*/,
                     const int64_t* blk_coeff_off,
                     const int32_t* orders, int num_ctxs, int ctx_offset,
                     int32_t* out_coeffs) {
  AnsDecoderC& ans = h->ans;
  std::vector<int32_t> nz(3 * static_cast<size_t>(bw) * bh, 0);
  const int nzero_buckets = 37;
  const int zero_density_count = 458;
  (void)nzero_buckets; (void)zero_density_count;
  static const int chan_order[3] = {1, 0, 2};
  for (int b = 0; b < num_blocks; b++) {
    const int bx = blk_bx[b], by = blk_by[b];
    const int cx = blk_cx[b], cy = blk_cy[b];
    const uint32_t covered = cx * cy;
    uint32_t log2_covered = 0;
    while ((1u << (log2_covered + 1)) <= covered) log2_covered++;
    const uint32_t size = covered * 64;
    for (int ci = 0; ci < 3; ci++) {
      const int c = chan_order[ci];
      int32_t* nzrow = &nz[static_cast<size_t>(c) * bw * bh];
      int32_t predicted;
      if (bx == 0) {
        predicted = by == 0 ? 32 : nzrow[(by - 1) * bw];
      } else if (by == 0) {
        predicted = nzrow[by * bw + bx - 1];
      } else {
        predicted = (nzrow[(by - 1) * bw + bx] + nzrow[by * bw + bx - 1] + 1)
                    / 2;
      }
      const int block_ctx = blk_ctx[b * 3 + c];
      uint32_t pnz = predicted >= 64 ? 64 : predicted;
      uint32_t nzc = pnz < 8 ? pnz : 4 + pnz / 2;
      const uint32_t nzero_ctx = nzc * num_ctxs + block_ctx + ctx_offset;
      uint32_t nzeros = ans.read_ctx(nzero_ctx);
      if (nzeros > size - covered) return -10;
      for (int iy = 0; iy < cy; iy++)
        for (int ix = 0; ix < cx; ix++)
          nzrow[(by + iy) * bw + bx + ix] =
              (nzeros + covered - 1) >> log2_covered;
      const uint32_t histo_offset =
          ctx_offset + num_ctxs * 37 + 458 * block_ctx;
      uint32_t prev = nzeros > size / 16 ? 0 : 1;
      int32_t* block = out_coeffs + blk_coeff_off[b]
                       + static_cast<int64_t>(c) * size;
      const int32_t* order = orders + blk_order_off[b * 3 + c];
      if (!ans.lz77_enabled) {
        for (uint32_t k = covered; k < size && nzeros != 0; k++) {
          const uint32_t ctx =
              histo_offset
              + zero_density_ctx(nzeros, k, covered, log2_covered, prev);
          const uint32_t u =
              ans.read_clustered_nolz(ans.context_map[ctx]);
          block[order[k]] += unpack_signed(u);
          prev = u != 0 ? 1 : 0;
          nzeros -= prev;
        }
      } else {
        for (uint32_t k = covered; k < size && nzeros != 0; k++) {
          const uint32_t ctx =
              histo_offset
              + zero_density_ctx(nzeros, k, covered, log2_covered, prev);
          const uint32_t u = ans.read_clustered(ans.context_map[ctx]);
          block[order[k]] += unpack_signed(u);
          prev = u != 0 ? 1 : 0;
          nzeros -= prev;
        }
      }
      if (nzeros != 0) return -11;
    }
  }
  return h->br.overread ? -1 : 0;
}

// Encoder mirror: emits (ctx, value) token pairs.
int64_t vardct_tokenize_ac(int bw, int bh, int num_blocks,
                           const int32_t* blk_bx, const int32_t* blk_by,
                           const int32_t* blk_cx, const int32_t* blk_cy,
                           const int32_t* blk_ctx, const int32_t* blk_order_off,
                           const int64_t* blk_coeff_off,
                           const int32_t* orders, int num_ctxs,
                           const int32_t* coeffs,
                           int32_t* out_ctx, uint32_t* out_val,
                           int64_t capacity) {
  std::vector<int32_t> nz(3 * static_cast<size_t>(bw) * bh, 0);
  static const int chan_order[3] = {1, 0, 2};
  int64_t count = 0;
  for (int b = 0; b < num_blocks; b++) {
    const int bx = blk_bx[b], by = blk_by[b];
    const int cx = blk_cx[b], cy = blk_cy[b];
    const uint32_t covered = cx * cy;
    uint32_t log2_covered = 0;
    while ((1u << (log2_covered + 1)) <= covered) log2_covered++;
    const uint32_t size = covered * 64;
    for (int ci = 0; ci < 3; ci++) {
      const int c = chan_order[ci];
      const int32_t* block = coeffs + blk_coeff_off[b]
                             + static_cast<int64_t>(c) * size;
      const int32_t* order = orders + blk_order_off[b * 3 + c];
      uint32_t nzeros = 0;
      for (uint32_t k = covered; k < size; k++) {
        if (block[order[k]] != 0) nzeros++;
      }
      int32_t* nzrow = &nz[static_cast<size_t>(c) * bw * bh];
      int32_t predicted;
      if (bx == 0) {
        predicted = by == 0 ? 32 : nzrow[(by - 1) * bw];
      } else if (by == 0) {
        predicted = nzrow[by * bw + bx - 1];
      } else {
        predicted = (nzrow[(by - 1) * bw + bx] + nzrow[by * bw + bx - 1] + 1)
                    / 2;
      }
      const int block_ctx = blk_ctx[b * 3 + c];
      uint32_t pnz = predicted >= 64 ? 64 : predicted;
      uint32_t nzc = pnz < 8 ? pnz : 4 + pnz / 2;
      if (count + 1 > capacity) return -2;
      out_ctx[count] = nzc * num_ctxs + block_ctx;
      out_val[count] = nzeros;
      count++;
      for (int iy = 0; iy < cy; iy++)
        for (int ix = 0; ix < cx; ix++)
          nzrow[(by + iy) * bw + bx + ix] =
              (nzeros + covered - 1) >> log2_covered;
      const uint32_t histo_offset = num_ctxs * 37 + 458 * block_ctx;
      uint32_t prev = nzeros > size / 16 ? 0 : 1;
      uint32_t rem = nzeros;
      for (uint32_t k = covered; k < size && rem != 0; k++) {
        int32_t coeff = block[order[k]];
        uint32_t u = pack_signed(coeff);
        if (count + 1 > capacity) return -2;
        out_ctx[count] = histo_offset
                         + zero_density_ctx(rem, k, covered, log2_covered,
                                            prev);
        out_val[count] = u;
        count++;
        prev = u != 0 ? 1 : 0;
        rem -= prev;
      }
    }
  }
  return count;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// LZ77 token matcher (enc_ans.cc ApplyLZ77_LZ77's hash-chain search).
// Greedy: at each position, walk a bounded hash chain of previous
// positions with the same 3-token prefix, take the longest extension.

#include <unordered_map>

extern "C" {

// Returns the number of output tokens written, or 0 when matches cover
// <5% of the stream (caller falls back to the plain token stream).
// out_* must have room for n + 2 entries.
// special: precomputed special-distance table (may be null, num_special
// == 0) used to remap short structured distances.
int64_t lz77_match(const int64_t* ctx, const int64_t* val, int64_t n,
                   const int64_t* special, int64_t num_special,
                   int64_t min_length, int64_t match_min,
                   int64_t* out_ctx, int64_t* out_val,
                   uint8_t* out_is_len) {
  if (n < 32) return 0;
  std::unordered_map<int64_t, int64_t> special_lut;
  for (int64_t i = 0; i < num_special; i++) {
    special_lut.emplace(special[i], i);  // first occurrence wins
  }
  std::unordered_map<uint64_t, int64_t> heads;
  heads.reserve(static_cast<size_t>(n));
  std::vector<int64_t> prev(n, -1);
  auto key = [&](int64_t i) -> uint64_t {
    uint64_t h = static_cast<uint64_t>(val[i]) * 0x9E3779B97F4A7C15ull;
    h ^= static_cast<uint64_t>(val[i + 1]) * 0xC2B2AE3D27D4EB4Full;
    h ^= (static_cast<uint64_t>(val[i + 2]) + 0x165667B19E3779F9ull) *
         0x27D4EB2F165667C5ull;
    return h;
  };
  // Each match consumes >= threshold inputs and emits 2 tokens, so the
  // n+2-sized output buffers only hold when threshold >= 2; enforce it
  // here rather than trusting every caller.
  const int64_t threshold =
      std::max<int64_t>(2, std::max(min_length, match_min));
  int64_t m = 0;
  int64_t matched = 0;
  int64_t i = 0;
  while (i < n) {
    int64_t best_len = 0, best_dist = 0;
    if (i + 3 <= n) {
      auto it = heads.find(key(i));
      int64_t cand = (it == heads.end()) ? -1 : it->second;
      int tries = 0;
      while (cand >= 0 && tries < 16) {
        int64_t length = 0;
        const int64_t limit = std::min<int64_t>(n - i, 65535);
        while (length < limit && val[cand + length] == val[i + length]) {
          length++;  // overlapping copies allowed (cand+length >= i ok)
        }
        if (length > best_len) {
          best_len = length;
          best_dist = i - cand;
        }
        cand = prev[cand];
        tries++;
      }
    }
    if (best_len >= threshold) {
      out_ctx[m] = ctx[i];
      out_val[m] = best_len;
      out_is_len[m] = 1;
      m++;
      auto sit = special_lut.find(best_dist);
      int64_t raw = (sit != special_lut.end())
                        ? sit->second
                        : best_dist - 1 + num_special;
      out_ctx[m] = -1;
      out_val[m] = raw;
      out_is_len[m] = 0;
      m++;
      const int64_t end = i + best_len;
      while (i < end) {
        if (i + 3 <= n) {
          uint64_t k = key(i);
          auto it = heads.find(k);
          prev[i] = (it == heads.end()) ? -1 : it->second;
          heads[k] = i;
        }
        i++;
      }
      matched += best_len;
    } else {
      out_ctx[m] = ctx[i];
      out_val[m] = val[i];
      out_is_len[m] = 0;
      m++;
      if (i + 3 <= n) {
        uint64_t k = key(i);
        auto it = heads.find(k);
        prev[i] = (it == heads.end()) ? -1 : it->second;
        heads[k] = i;
      }
      i++;
    }
  }
  if (matched < n / 20) return 0;
  return m;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// AC-metadata expansion (dec_modular.cc:467-563's strategy/qf scan):
// sequential cover-skipping scan expanding per-block streams into maps.

extern "C" {

// Returns number of consumed entries, or a negative error:
// -1 stream too short, -2 invalid strategy, -3 crosses group,
// -4 out of bounds, -5 overlap, -6 count mismatch.
int64_t acs_expand(const int32_t* acs_vals, const int32_t* qf_vals,
                   int64_t count, int64_t w, int64_t h, int64_t x0,
                   int64_t y0, int64_t gdb, const int32_t* covered_x,
                   const int32_t* covered_y, int64_t num_strategies,
                   int32_t* strategies, int32_t* raw_quant) {
  std::vector<uint8_t> covered(static_cast<size_t>(w * h), 0);
  for (int64_t i = 0; i < w * h; i++) {
    strategies[i] = -1;
    raw_quant[i] = 1;
  }
  int64_t num = 0;
  for (int64_t iy = 0; iy < h; iy++) {
    for (int64_t ix = 0; ix < w; ix++) {
      if (covered[iy * w + ix]) continue;
      if (num >= count) return -1;
      int32_t s = acs_vals[num];
      if (s < 0 || s >= num_strategies) return -2;
      int64_t cx = covered_x[s], cy = covered_y[s];
      if (((x0 + ix) % gdb) + cx > gdb || ((y0 + iy) % gdb) + cy > gdb) {
        return -3;
      }
      if (iy + cy > h || ix + cx > w) return -4;
      for (int64_t dy = 0; dy < cy; dy++) {
        for (int64_t dx = 0; dx < cx; dx++) {
          if (covered[(iy + dy) * w + ix + dx]) return -5;
        }
      }
      int32_t q = qf_vals[num];
      q = 1 + (q < 0 ? 0 : (q > 255 ? 255 : q));
      strategies[iy * w + ix] = s;
      for (int64_t dy = 0; dy < cy; dy++) {
        for (int64_t dx = 0; dx < cx; dx++) {
          covered[(iy + dy) * w + ix + dx] = 1;
          raw_quant[(iy + dy) * w + ix + dx] = q;
        }
      }
      num++;
    }
  }
  if (num != count) return -6;
  return num;
}

}  // extern "C"

// ===========================================================================
// ANS histogram reading (dec_ans.cc ReadHistogram) fused with alias-table
// construction (ans_common.cc InitAliasTable): bitstream -> packed alias
// slots, one ctypes call per histogram set instead of a Python bit loop.

namespace {

inline uint32_t read_varlen_u8(BitReaderC& br) {
  if (br.read(1)) {
    uint32_t nbits = br.read(3);
    if (nbits == 0) return 1;
    return br.read(nbits) + (1u << nbits);
  }
  return 0;
}

// Canonical bit-width code (dec_ans.cc:108-125): 7-bit LSB-first peek ->
// (consumed bits, logcount+1).
struct BitWidthLut {
  uint8_t consumed[128];
  uint8_t value[128];
  BitWidthLut() {
    static const uint8_t lens[14] = {5, 4, 4, 4, 4, 4, 3, 3, 3, 3, 3, 6, 7, 7};
    static const uint8_t syms[14] = {17, 11, 15, 3, 9, 7, 4, 2, 5, 6, 0,
                                     33, 1, 65};
    std::memset(consumed, 0, sizeof(consumed));
    std::memset(value, 0, sizeof(value));
    for (int v = 0; v < 14; v++) {
      for (int high = 0; high < (1 << (7 - lens[v])); high++) {
        int idx = syms[v] | (high << lens[v]);
        consumed[idx] = lens[v];
        value[idx] = static_cast<uint8_t>(v);
      }
    }
  }
};
const BitWidthLut kBitWidthLut;

inline int get_pop_count_precision(int logcount, int shift) {
  int r = std::min(logcount,
                   shift - ((static_cast<int>(kAnsLogTabSize) - logcount) >> 1));
  return std::max(r, 0);
}

// ReadHistogram (dec_ans.cc:58-191). Fills counts[0..len), returns len
// (may exceed max_alpha; caller validates) or a negative error.
int read_histogram_counts(BitReaderC& br, int32_t* counts, int cap) {
  const int32_t rng = static_cast<int32_t>(kAnsTabSize);
  if (br.read(1)) {  // simple
    int num_symbols = static_cast<int>(br.read(1)) + 1;
    uint32_t syms[2] = {0, 0};
    for (int i = 0; i < num_symbols; i++) syms[i] = read_varlen_u8(br);
    int len = static_cast<int>(std::max(syms[0],
                                        num_symbols == 2 ? syms[1] : 0u)) + 1;
    if (len > cap) return -2;
    std::fill(counts, counts + len, 0);
    if (num_symbols == 1) {
      counts[syms[0]] = rng;
    } else {
      if (syms[0] == syms[1]) return -3;
      counts[syms[0]] = static_cast<int32_t>(br.read(kAnsLogTabSize));
      counts[syms[1]] = rng - counts[syms[0]];
    }
    return len;
  }
  if (br.read(1)) {  // flat
    int len = static_cast<int>(read_varlen_u8(br)) + 1;
    if (len > rng || len > cap) return -4;
    int32_t base = rng / len, rem = rng % len;
    for (int i = 0; i < len; i++) counts[i] = base + (i < rem ? 1 : 0);
    return len;
  }
  // general
  int upper_bound_log = 3;  // floor_log2(12 + 1)
  int log = 0;
  while (log < upper_bound_log) {
    if (br.read(1) == 0) break;
    log++;
  }
  int shift = static_cast<int>(br.read(log) | (1u << log)) - 1;
  if (shift > static_cast<int>(kAnsLogTabSize) + 1) return -5;
  int length = static_cast<int>(read_varlen_u8(br)) + 3;
  if (length > cap) return -2;
  std::vector<int> logcounts(length, 0), same(length, 0);
  std::fill(counts, counts + length, 0);
  int omit_log = -1, omit_pos = -1;
  for (int i = 0; i < length;) {
    br.refill(7);
    uint32_t idx = static_cast<uint32_t>(br.buf & 127u);
    br.consume(kBitWidthLut.consumed[idx]);
    logcounts[i] = static_cast<int>(kBitWidthLut.value[idx]) - 1;
    if (logcounts[i] == static_cast<int>(kAnsLogTabSize)) {  // RLE
      int rle = static_cast<int>(read_varlen_u8(br));
      same[i] = rle + 5;
      i += rle + 4;
      continue;
    }
    if (logcounts[i] > omit_log) {
      omit_log = logcounts[i];
      omit_pos = i;
    }
    i++;
  }
  if (omit_pos < 0) return -6;
  if (omit_pos + 1 < length &&
      logcounts[omit_pos + 1] == static_cast<int>(kAnsLogTabSize)) return -7;
  int64_t total = 0;
  int32_t prev = 0;
  int numsame = 0;
  for (int i = 0; i < length; i++) {
    if (same[i]) {
      numsame = same[i] - 1;
      prev = i > 0 ? counts[i - 1] : 0;
    }
    if (numsame > 0) {
      counts[i] = prev;
      numsame--;
    } else {
      int code = logcounts[i];
      if (i == omit_pos || code < 0) continue;
      if (shift == 0 || code == 0) {
        counts[i] = 1 << code;
      } else {
        int bitcount = get_pop_count_precision(code, shift);
        counts[i] = (1 << code) +
                    (static_cast<int32_t>(br.read(bitcount)) << (code - bitcount));
      }
    }
    total += counts[i];
  }
  counts[omit_pos] = rng - static_cast<int32_t>(total);
  if (counts[omit_pos] <= 0) return -8;
  return length;
}

// InitAliasTable (ans_common.cc:42-146) -> packed slots
// value:8 | offset:12 | (freq-1):12, matching entropy/ans.py exactly
// (including the LIFO overfull/underfull pairing order).
static inline uint32_t pack_slot(uint32_t sym, uint32_t off, uint32_t freq) {
  // freq 0 only occurs on slots no valid state reaches; clamp so the
  // (freq-1) field cannot wrap.
  if (freq == 0) freq = 1;
  return (sym & 0xFF) | ((off & 0xFFF) << 8) | ((freq - 1) << 20);
}
int build_alias_packed(const int32_t* counts_in, int n_in, int log_alpha_size,
                       uint32_t* packed) {
  int n = n_in;
  while (n > 0 && counts_in[n - 1] == 0) n--;
  int32_t one[1] = {static_cast<int32_t>(kAnsTabSize)};
  const int32_t* dist = counts_in;
  if (n == 0) {
    dist = one;
    n = 1;
  }
  const int table_size = 1 << log_alpha_size;
  if (n > table_size) return -2;
  int64_t sum = 0;
  for (int i = 0; i < n; i++) sum += dist[i];
  if (sum != static_cast<int64_t>(kAnsTabSize)) return -3;
  const int entry_size = kAnsTabSize >> log_alpha_size;

  for (int s = 0; s < n; s++) {
    if (dist[s] == static_cast<int32_t>(kAnsTabSize)) {
      // Single-symbol: identity decode, freq = table size.
      for (uint32_t i = 0; i < kAnsTabSize; i++) {
        packed[i] = pack_slot(s, i, kAnsTabSize);
      }
      return 0;
    }
  }

  std::vector<int> cutoffs(table_size, 0), right_value(table_size, 0),
      offsets1(table_size, 0), final_cutoff(table_size, 0);
  std::vector<int> underfull, overfull;
  underfull.reserve(table_size);
  overfull.reserve(table_size);
  for (int i = 0; i < n; i++) {
    cutoffs[i] = dist[i];
    if (cutoffs[i] > entry_size) overfull.push_back(i);
    else if (cutoffs[i] < entry_size) underfull.push_back(i);
  }
  for (int i = n; i < table_size; i++) underfull.push_back(i);
  while (!overfull.empty()) {
    int oi = overfull.back();
    overfull.pop_back();
    if (underfull.empty()) return -4;
    int ui = underfull.back();
    underfull.pop_back();
    int by = entry_size - cutoffs[ui];
    cutoffs[oi] -= by;
    right_value[ui] = oi;
    offsets1[ui] = cutoffs[oi];
    if (cutoffs[oi] < entry_size) underfull.push_back(oi);
    else if (cutoffs[oi] > entry_size) overfull.push_back(oi);
  }
  for (int i = 0; i < table_size; i++) {
    if (cutoffs[i] == entry_size) {
      right_value[i] = i;
      offsets1[i] = 0;
      final_cutoff[i] = 0;
    } else {
      offsets1[i] -= cutoffs[i];
      final_cutoff[i] = cutoffs[i];
    }
  }
  for (uint32_t idx = 0; idx < kAnsTabSize; idx++) {
    uint32_t slot = idx >> (kAnsLogTabSize - log_alpha_size);
    uint32_t pos = idx & (entry_size - 1);
    bool use_right = static_cast<int>(pos) >= final_cutoff[slot];
    uint32_t sym = use_right ? right_value[slot] : slot;
    uint32_t off = use_right ? offsets1[slot] + pos : pos;
    uint32_t freq = sym < static_cast<uint32_t>(n) ? dist[sym] : 0;
    packed[idx] = pack_slot(sym, off, freq);
  }
  return 0;
}

}  // namespace

extern "C" {

// Read `num` ANS histograms starting at *bit_pos and build their packed
// alias tables (out_packed: num x 4096 uint32, out_alpha: num int32).
// Updates *bit_pos past the histograms. Returns 0 or a negative error.
int64_t ans_read_histograms_build(const uint8_t* data, uint64_t size,
                                  uint64_t* bit_pos, int num,
                                  int log_alpha_size, int max_alpha,
                                  uint32_t* out_packed, int32_t* out_alpha) {
  BitReaderC br;
  br.data = data;
  br.size = size;
  br.pos = *bit_pos / 8;
  br.buf = 0;
  br.bits = 0;
  br.consumed = *bit_pos;
  br.overread = false;
  uint32_t rem = *bit_pos % 8;
  if (rem) {
    br.refill(8);
    br.buf >>= rem;
    br.bits -= rem;
  }
  int32_t counts[300];
  for (int h = 0; h < num; h++) {
    int len = read_histogram_counts(br, counts, 300);
    if (len < 0) return len;
    if (len > max_alpha) return -2;
    int rc = build_alias_packed(counts, len, log_alpha_size,
                                out_packed + static_cast<size_t>(h) * kAnsTabSize);
    if (rc < 0) return rc - 20;
    out_alpha[h] = len;
  }
  *bit_pos = br.consumed;  // tables are complete even on overread
  if (br.overread) return -1;
  return 0;
}

// Read n hybrid-uints from one clustered context (context-map decode,
// coefficient-order permutations...). Returns 0 or -1 on overread.
int64_t ans_read_stream_u32(ModularDecoderHandle* h, int cluster, int64_t n,
                            uint32_t* out) {
  for (int64_t i = 0; i < n; i++) {
    out[i] = h->ans.read_clustered(static_cast<uint32_t>(cluster));
  }
  return h->br.overread ? -1 : 0;
}

// In-place inverse move-to-front over uint32 values (inverse_mtf-inl.h).
void inverse_mtf_u32(uint32_t* values, int64_t n) {
  uint8_t mtf[256];
  for (int i = 0; i < 256; i++) mtf[i] = static_cast<uint8_t>(i);
  for (int64_t i = 0; i < n; i++) {
    uint32_t v = values[i];
    if (v > 255) v = 255;
    uint8_t sym = mtf[v];
    values[i] = sym;
    for (uint32_t j = v; j > 0; j--) mtf[j] = mtf[j - 1];
    mtf[0] = sym;
  }
}


// ---------------------------------------------------------------------------
// Interleaved multi-group AC decode. N independent rANS streams decode
// in lockstep on one core so their serial state-update chains overlap
// (the single-stream decode is latency-bound on alias-table loads and
// the state multiply; 4-way interleave measures ~4x on one core).

}  // extern "C" (templates below need C++ linkage)

namespace {

struct AcStream {
  // bit reader (register-local mirror of BitReaderC). Consumed-bit
  // count is NOT tracked per token: the invariant
  //   bconsumed == (bpos + vbytes) * 8 - bbits
  // holds because every refill adds whole (possibly virtual) bytes and
  // every consumption decrements bbits; recompute it at the end.
  const uint8_t* bdata;
  uint64_t bsize, bpos, bbuf, vbytes = 0;
  uint32_t bbits;
  uint32_t state;
  // FSM position
  int b = 0;        // block index
  int ci = 0;       // channel-order index (0..2 -> channel 1,0,2)
  int phase = 0;    // 0 = read nzeros next, 1 = coefficient loop
  uint32_t k = 0, size = 0, covered = 0, log2_covered = 0,
           nzeros = 0, prev = 0;
  // cached per (b, ci)
  int16_t* block = nullptr;
  const int32_t* order = nullptr;
  uint32_t histo_offset = 0;
  int16_t* base0 = nullptr;
  // per-group tables
  const int32_t *blk_bx, *blk_by, *blk_cx, *blk_cy, *blk_ctx, *blk_oo,
      *strat;
  const int32_t* orders;
  int32_t* nz;
  int num_blocks, bw, bh;
  int ctx_offset;
  int shift;        // progressive pass coefficient shift
  int16_t* frame;
  int64_t plane_stride, row_stride, origin;
  int8_t* mat_ids;
  int64_t mat_stride, mat_origin;
  const int8_t* slot_lut;
  // Sparse coefficient emission (shared across streams; single thread).
  const int16_t* frame_base = nullptr;
  int32_t* nz_idx = nullptr;
  int16_t* nz_val = nullptr;
  int64_t* nz_cursor = nullptr;
  int64_t nz_cap = 0;
  int rc = 0;
  bool done = false;

  void refill56() {
    if (bbits < 56) {
      if (bpos + 8 <= bsize) {
        uint64_t chunk;
        __builtin_memcpy(&chunk, bdata + bpos, 8);
        bbuf |= chunk << bbits;
        uint32_t nb = (63 - bbits) >> 3;
        bpos += nb;
        bbits += nb * 8;
      } else {
        while (bbits < 56) {
          if (bpos < bsize) bbuf |= (uint64_t)bdata[bpos++] << bbits;
          else vbytes++;
          bbits += 8;
        }
      }
    }
  }

  uint64_t bconsumed() const { return (bpos + vbytes) * 8 - bbits; }
};

// Decode exactly one token for stream s (a coefficient, or the nzeros
// count opening a (block, channel) pair). Tables shared across streams.
// Per-(cluster, token) hybrid-uint decode table: u = base + (eb << lsb)
// with eb = next `nbits` bits. Covers the token < split case with
// nbits = lsb = 0, base = token, so the extra-bits read is branchless.
struct TokLut {
  uint32_t base;
  uint8_t nbits;
  uint8_t lsb;
  uint16_t _pad;
};

// Optional per-token counter for microbenchmarks only: an unconditional
// global RMW serializes all interleaved streams, so it is compiled out
// by default (build with -DJXL_COUNT_TOKENS to enable).
#ifdef JXL_COUNT_TOKENS
uint64_t g_ac_tokens = 0;
#define JXL_TOKEN_TICK() g_ac_tokens++
#else
#define JXL_TOKEN_TICK()
#endif
extern "C" uint64_t jxl_ac_token_count() {
#ifdef JXL_COUNT_TOKENS
  return g_ac_tokens;
#else
  return 0;
#endif
}

// kMode: 0 = dense frame only, 1 = dense + sparse sink, 2 = sparse sink
// ONLY (the dense int16 frame is never touched — no RMW cache misses on
// the 50 MB coefficient image; a -13 return asks the caller to redo
// densely when the sink capacity is exceeded).
template <int kMode>
static inline __attribute__((always_inline)) void ac_step(
    AcStream& s, const uint32_t* alias, const uint8_t* cmap,
    const TokLut* toklut, int num_ctxs, int64_t& nzcur) {
  JXL_TOKEN_TICK();
  uint32_t ctx;
  if (s.phase == 1) {
    ctx = s.histo_offset + zero_density_ctx_lut(s.nzeros, s.k, s.covered,
                                                s.log2_covered, s.prev);
  } else {
    // Start of (b, ci): per-block setup when ci == 0.
    const int b = s.b;
    if (s.ci == 0) {
      const int cx = s.blk_cx[b], cy = s.blk_cy[b];
      s.covered = cx * cy;
      s.log2_covered = 0;
      while ((1u << (s.log2_covered + 1)) <= s.covered) s.log2_covered++;
      s.size = s.covered * 64;
      s.base0 = s.frame + s.origin +
                (int64_t)s.blk_by[b] * 8 * s.row_stride +
                (int64_t)s.blk_bx[b] * 8;
      if (s.slot_lut) {
        int8_t slot = s.strat ? s.slot_lut[s.strat[b] & 63] : -1;
        if (slot >= 0) {
          s.mat_ids[s.mat_origin + (int64_t)s.blk_by[b] * s.mat_stride +
                    s.blk_bx[b]] = slot;
        }
      }
    }
    static const int chan_order[3] = {1, 0, 2};
    const int c = chan_order[s.ci];
    const int bx = s.blk_bx[b], by = s.blk_by[b];
    int32_t* nzrow = s.nz + (size_t)c * s.bw * s.bh;
    int32_t predicted;
    if (bx == 0) {
      predicted = by == 0 ? 32 : nzrow[(by - 1) * s.bw];
    } else if (by == 0) {
      predicted = nzrow[by * s.bw + bx - 1];
    } else {
      predicted =
          (nzrow[(by - 1) * s.bw + bx] + nzrow[by * s.bw + bx - 1] + 1) / 2;
    }
    const int block_ctx = s.blk_ctx[b * 3 + c];
    uint32_t pnz = predicted >= 64 ? 64 : predicted;
    uint32_t nzc = pnz < 8 ? pnz : 4 + pnz / 2;
    ctx = nzc * num_ctxs + block_ctx + s.ctx_offset;
    s.histo_offset = s.ctx_offset + num_ctxs * 37 + 458 * block_ctx;
    s.block = s.base0 + c * s.plane_stride;
    s.order = s.orders + s.blk_oo[b * 3 + c];
  }
  // --- shared token read (one bulk refill covers renorm + extra bits) ---
  s.refill56();
  const uint32_t cluster = cmap[ctx];
  const uint32_t slot =
      alias[(size_t)cluster * kAnsTabSize + (s.state & (kAnsTabSize - 1))];
  const uint32_t token = slot & 0xFF;
  // The hybrid-uint LUT load only needs (cluster, token) — issue it
  // before the renorm chain so it overlaps the state arithmetic.
  const TokLut tl = toklut[((size_t)cluster << 8) | token];
  s.state = ((slot >> 20) + 1) * (s.state >> kAnsLogTabSize) +
            ((slot >> 8) & 0xFFF);
  // Branchless renorm (the 16-bit refill fires on ~half of tokens with
  // no predictable pattern) merged with the extra-bits read: ONE
  // combined bbuf shift and bbits update instead of two of each.
  const uint32_t renorm = s.state < (1u << 16);
  const uint32_t ns = (s.state << 16) | (uint32_t)(s.bbuf & 0xFFFF);
  const uint32_t sh = renorm << 4;
  s.state = renorm ? ns : s.state;
  const uint32_t eb =
      (uint32_t)((s.bbuf >> sh) & ((1ull << tl.nbits) - 1));
  s.bbuf >>= sh + tl.nbits;
  s.bbits -= sh + tl.nbits;
  const uint32_t u = tl.base + (eb << tl.lsb);
  // --- consume the token ---
  if (s.phase == 1) {
    const int32_t v = unpack_signed(u);
    // Orders are pre-baked PIXEL offsets (pass_order_offsets): one add
    // replaces the shift/mask/multiply block-address math per token.
    int16_t* dst = s.block + s.order[s.k];
    if (kMode == 2) {
      // Sink-only: never dereference dst (the dense frame stays
      // untouched — zero RMW misses, zero first-touch page faults).
      // Check the per-pass CONTRIBUTION fits int16 (the device
      // scatter-add accumulates in wider precision, so only the stored
      // nz_val width matters, not the cross-pass sum).
      const int32_t vs = v << s.shift;
      if (vs != (int16_t)vs) {
        s.rc = -12;
        s.done = true;
        return;
      }
      if (nzcur < s.nz_cap) {
        s.nz_idx[nzcur] = (int32_t)(dst - s.frame_base);
        s.nz_val[nzcur] = (int16_t)vs;
        nzcur += (v != 0);
      } else if (v != 0) {
        s.rc = -13;
        s.done = true;
        return;
      }
    } else {
      const int32_t nv = *dst + (v << s.shift);
      if (nv != (int16_t)nv) {
        s.rc = -12;
        s.done = true;
        return;
      }
      *dst = (int16_t)nv;
    }
    if (kMode == 1) {
      // Append this pass's CONTRIBUTION (a device scatter-add over all
      // passes reconstructs the frame); on capacity overflow flag via
      // cursor = -1 and the host falls back to the dense transfer.
      // Branchless: always store at the cursor, advance by (v != 0) —
      // the zero/nonzero pattern is unpredictable per token. The cursor
      // lives in a register in the lockstep driver (a shared in-memory
      // cursor would serialize the interleaved streams on one RMW chain).
      if (nzcur >= 0 && nzcur < s.nz_cap) {
        s.nz_idx[nzcur] = (int32_t)(dst - s.frame_base);
        s.nz_val[nzcur] = (int16_t)(v << s.shift);
        nzcur += (v != 0);
      } else if (nzcur >= 0 && v != 0) {
        nzcur = -1;
      }
    }
    s.prev = u != 0 ? 1 : 0;
    s.nzeros -= s.prev;
    s.k++;
    if (s.nzeros == 0 || s.k >= s.size) {
      if (s.nzeros != 0) {
        s.rc = -11;
        s.done = true;
        return;
      }
      s.phase = 0;
      s.ci++;
      if (s.ci == 3) {
        s.ci = 0;
        s.b++;
        if (s.b >= s.num_blocks) s.done = true;
      }
    }
  } else {
    // u = nzeros for this (b, ci)
    if (u > s.size - s.covered) {
      s.rc = -10;
      s.done = true;
      return;
    }
    const int b = s.b;
    static const int chan_order[3] = {1, 0, 2};
    const int c = chan_order[s.ci];
    const int bx = s.blk_bx[b], by = s.blk_by[b];
    int32_t* nzrow = s.nz + (size_t)c * s.bw * s.bh;
    const int cy = s.blk_cy[b], cx = s.blk_cx[b];
    for (int iy = 0; iy < cy; iy++)
      for (int ix = 0; ix < cx; ix++)
        nzrow[(by + iy) * s.bw + bx + ix] =
            (u + s.covered - 1) >> s.log2_covered;
    s.nzeros = u;
    s.prev = u > s.size / 16 ? 0 : 1;
    s.k = s.covered;
    if (u == 0) {
      s.ci++;
      if (s.ci == 3) {
        s.ci = 0;
        s.b++;
        if (s.b >= s.num_blocks) s.done = true;
      }
    } else {
      s.phase = 1;
    }
  }
}

// Lockstep driver: 8-way while enough live streams (ILP hides the
// per-stream alias-table load latency), then 4/2/1-way tails; the
// active list is compacted whenever any stream finishes.
template <int kMode>
static void run_ac_lockstep(std::vector<AcStream*>& act,
                            const uint32_t* alias32, const uint8_t* cmap,
                            const TokLut* cf, int num_ctxs,
                            int64_t& nzcur) {
  while (act.size() >= 8) {
    AcStream &a = *act[0], &b = *act[1], &c = *act[2], &d = *act[3];
    AcStream &e = *act[4], &f = *act[5], &g2 = *act[6], &h2 = *act[7];
    while (!a.done && !b.done && !c.done && !d.done &&
           !e.done && !f.done && !g2.done && !h2.done) {
      ac_step<kMode>(a, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(b, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(c, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(d, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(e, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(f, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(g2, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(h2, alias32, cmap, cf, num_ctxs, nzcur);
    }
    for (size_t i = 0; i < act.size();) {
      if (act[i]->done) act.erase(act.begin() + i);
      else i++;
    }
  }
  while (act.size() >= 4) {
    AcStream &a = *act[0], &b = *act[1], &c = *act[2], &d = *act[3];
    while (!a.done && !b.done && !c.done && !d.done) {
      ac_step<kMode>(a, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(b, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(c, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(d, alias32, cmap, cf, num_ctxs, nzcur);
    }
    for (size_t i = 0; i < act.size();) {
      if (act[i]->done) act.erase(act.begin() + i);
      else i++;
    }
  }
  while (act.size() >= 2) {
    AcStream &a = *act[0], &b = *act[1];
    while (!a.done && !b.done) {
      ac_step<kMode>(a, alias32, cmap, cf, num_ctxs, nzcur);
      ac_step<kMode>(b, alias32, cmap, cf, num_ctxs, nzcur);
    }
    for (size_t i = 0; i < act.size();) {
      if (act[i]->done) act.erase(act.begin() + i);
      else i++;
    }
  }
  if (!act.empty()) {
    AcStream& a = *act[0];
    while (!a.done) ac_step<kMode>(a, alias32, cmap, cf, num_ctxs, nzcur);
  }
}

}  // namespace

extern "C" {

// Interleaved decode of n independent AC group sections of one pass.
// Coefficients are ACCUMULATED into the int16 frame image as
// (value << shift), so progressive passes chain over the same buffer
// (callers zero it before pass 0). Per-group arrays are concatenated,
// g_blk_off giving each group's first block index. Per-group results:
// out_rc (0 ok, -10/-11 stream error, -12 int16 overflow, -1 overread),
// out_bitpos (bit position after the group's coefficients) and
// out_final (ANS final-state check). Returns 0.
int vardct_decode_ac_multi(
    int n_groups, const uint8_t** g_data, const uint64_t* g_size,
    const uint64_t* g_bitpos, const uint32_t* alias32, const uint8_t* cmap,
    const int32_t* uint_cfgs, int num_clusters, int num_ctxs,
    const int32_t* g_ctx_offset, int shift,
    const int32_t* g_num_blocks, const int64_t* g_blk_off,
    const int32_t* g_bw, const int32_t* g_bh, const int64_t* g_origin,
    const int64_t* g_mat_origin, const int32_t* blk_bx,
    const int32_t* blk_by, const int32_t* blk_cx, const int32_t* blk_cy,
    const int32_t* blk_ctx, const int32_t* blk_order_off,
    const int32_t* orders, const int32_t* blk_strat, const int8_t* slot_lut,
    int16_t* frame, int64_t plane_stride, int64_t row_stride,
    int8_t* mat_ids, int64_t mat_stride, int32_t* out_rc,
    uint64_t* out_bitpos, int32_t* out_final,
    int32_t* nz_idx, int16_t* nz_val, int64_t nz_cap,
    int64_t* nz_cursor, int sink_only) {
  // Expand each cluster's hybrid-uint config into a 256-entry token LUT
  // (u = base + (extra_bits << lsb)); ~2 KB per cluster, built once per
  // pass and shared by every group section.
  std::vector<TokLut> toklut((size_t)num_clusters << 8);
  for (int i = 0; i < num_clusters; i++) {
    const uint32_t se = (uint32_t)uint_cfgs[i * 3];
    const uint32_t msb = (uint32_t)uint_cfgs[i * 3 + 1];
    const uint32_t lsb = (uint32_t)uint_cfgs[i * 3 + 2];
    const uint32_t split = 1u << se;
    for (uint32_t t = 0; t < 256; t++) {
      TokLut& e = toklut[((size_t)i << 8) | t];
      if (t < split) {
        e = {t, 0, 0, 0};
      } else {
        const uint32_t mt = msb + lsb;
        const uint32_t nbits = (se - mt + ((t - split) >> mt)) & 31u;
        const uint32_t low = t & ((1u << lsb) - 1);
        const uint32_t tk = t >> lsb;
        const uint32_t msbp = (1u << msb) | (tk & ((1u << msb) - 1));
        e = {(msbp << (nbits + lsb)) | low, (uint8_t)nbits, (uint8_t)lsb,
             0};
      }
    }
  }
  std::vector<AcStream> streams(n_groups);
  std::vector<std::vector<int32_t>> nzbufs(n_groups);
  for (int g = 0; g < n_groups; g++) {
    AcStream& s = streams[g];
    s.bdata = g_data[g];
    s.bsize = g_size[g];
    uint64_t bit_pos = g_bitpos[g];
    s.bpos = bit_pos / 8;
    s.bbuf = 0;
    s.bbits = 0;
    uint32_t rem = bit_pos % 8;
    if (rem) {
      s.refill56();
      s.bbuf >>= rem;
      s.bbits -= rem;
    }
    s.refill56();
    s.state = (uint32_t)(s.bbuf & 0xFFFFFFFFu);
    s.bbuf >>= 32;
    s.bbits -= 32;
    s.blk_bx = blk_bx + g_blk_off[g];
    s.blk_by = blk_by + g_blk_off[g];
    s.blk_cx = blk_cx + g_blk_off[g];
    s.blk_cy = blk_cy + g_blk_off[g];
    s.blk_ctx = blk_ctx + g_blk_off[g] * 3;
    s.blk_oo = blk_order_off + g_blk_off[g] * 3;
    s.strat = blk_strat ? blk_strat + g_blk_off[g] : nullptr;
    s.orders = orders;
    s.num_blocks = g_num_blocks[g];
    s.bw = g_bw[g];
    s.bh = g_bh[g];
    s.ctx_offset = g_ctx_offset[g];
    s.shift = shift;
    nzbufs[g].assign(3 * (size_t)s.bw * s.bh, 0);
    s.nz = nzbufs[g].data();
    s.frame = frame;
    s.plane_stride = plane_stride;
    s.row_stride = row_stride;
    s.origin = g_origin[g];
    s.mat_ids = mat_ids;
    s.mat_stride = mat_stride;
    s.mat_origin = g_mat_origin[g];
    s.slot_lut = slot_lut;
    s.frame_base = frame;
    s.nz_idx = nz_idx;
    s.nz_val = nz_val;
    s.nz_cursor = nz_cursor;
    s.nz_cap = nz_cap;
    if (s.num_blocks == 0) s.done = true;
  }
  std::vector<AcStream*> act;
  act.reserve(n_groups);
  for (auto& s : streams)
    if (!s.done) act.push_back(&s);
  const TokLut* cf = toklut.data();
  if (nz_idx && sink_only) {
    int64_t cur = *nz_cursor;
    run_ac_lockstep<2>(act, alias32, cmap, cf, num_ctxs, cur);
    *nz_cursor = cur;
  } else if (nz_idx) {
    int64_t cur = *nz_cursor;
    run_ac_lockstep<1>(act, alias32, cmap, cf, num_ctxs, cur);
    *nz_cursor = cur;
  } else {
    int64_t cur = 0;
    run_ac_lockstep<0>(act, alias32, cmap, cf, num_ctxs, cur);
  }
  for (int g = 0; g < n_groups; g++) {
    AcStream& s = streams[g];
    const uint64_t consumed = s.bconsumed();
    out_rc[g] = s.rc != 0 ? s.rc : (consumed > s.bsize * 8 ? -1 : 0);
    out_bitpos[g] = consumed;
    out_final[g] = (s.state == (kAnsSignature << 16)) ? 1 : 0;
  }
  return 0;
}

}  // extern "C"

extern "C"
// AC group decode straight into the frame-level int16 coefficient image
// (the device feed), merging vardct_decode_ac with the feed scatter:
//   frame[c][gy0*8 + by*8 + r][gx0*8 + bx*8 + s]  (strides in elements)
// Also fills the 8x8-family transform-slot map. Returns 0, or -12 when a
// coefficient overflows int16 (caller falls back to the int32 path), or
// the vardct_decode_ac error codes.
int vardct_decode_ac_frame(
    ModularDecoderHandle* h, int bw, int bh, int num_blocks,
    const int32_t* blk_bx, const int32_t* blk_by, const int32_t* blk_cx,
    const int32_t* blk_cy, const int32_t* blk_ctx /*3/blk*/,
    const int32_t* blk_order_off /*3/blk*/, const int32_t* orders,
    int num_ctxs, int ctx_offset, const int32_t* blk_strat,
    const int8_t* slot_lut /*64: strategy -> family8 slot or -1*/,
    int16_t* frame, int64_t plane_stride, int64_t row_stride,
    int64_t origin /*pixel offset of the group's top-left*/,
    int8_t* mat_ids, int64_t mat_stride, int64_t mat_origin) {
  AnsDecoderC& ans = h->ans;
  std::vector<int32_t> nz(3 * static_cast<size_t>(bw) * bh, 0);
  static const int chan_order[3] = {1, 0, 2};
  for (int b = 0; b < num_blocks; b++) {
    const int bx = blk_bx[b], by = blk_by[b];
    const int cx = blk_cx[b], cy = blk_cy[b];
    const uint32_t covered = cx * cy;
    uint32_t log2_covered = 0;
    while ((1u << (log2_covered + 1)) <= covered) log2_covered++;
    const uint32_t size = covered * 64;
    // Stored grid is row-major over (cy*8, cx*8); cx is a power of two.
    uint32_t wlog = 3;
    while ((1u << wlog) < static_cast<uint32_t>(cx * 8)) wlog++;
    const uint32_t wmask = (1u << wlog) - 1;
    int16_t* base0 = frame + origin + static_cast<int64_t>(by) * 8 * row_stride
                     + static_cast<int64_t>(bx) * 8;
    if (slot_lut) {
      int8_t slot = blk_strat ? slot_lut[blk_strat[b] & 63] : -1;
      if (slot >= 0) {
        mat_ids[mat_origin + static_cast<int64_t>(by) * mat_stride + bx] = slot;
      }
    }
    for (int ci = 0; ci < 3; ci++) {
      const int c = chan_order[ci];
      int32_t* nzrow = &nz[static_cast<size_t>(c) * bw * bh];
      int32_t predicted;
      if (bx == 0) {
        predicted = by == 0 ? 32 : nzrow[(by - 1) * bw];
      } else if (by == 0) {
        predicted = nzrow[by * bw + bx - 1];
      } else {
        predicted = (nzrow[(by - 1) * bw + bx] + nzrow[by * bw + bx - 1] + 1)
                    / 2;
      }
      const int block_ctx = blk_ctx[b * 3 + c];
      uint32_t pnz = predicted >= 64 ? 64 : predicted;
      uint32_t nzc = pnz < 8 ? pnz : 4 + pnz / 2;
      const uint32_t nzero_ctx = nzc * num_ctxs + block_ctx + ctx_offset;
      uint32_t nzeros = ans.read_ctx(nzero_ctx);
      if (nzeros > size - covered) return -10;
      for (int iy = 0; iy < cy; iy++)
        for (int ix = 0; ix < cx; ix++)
          nzrow[(by + iy) * bw + bx + ix] =
              (nzeros + covered - 1) >> log2_covered;
      const uint32_t histo_offset =
          ctx_offset + num_ctxs * 37 + 458 * block_ctx;
      uint32_t prev = nzeros > size / 16 ? 0 : 1;
      int16_t* block = base0 + c * plane_stride;
      const int32_t* order = orders + blk_order_off[b * 3 + c];
      if (!ans.lz77_enabled) {
        for (uint32_t k = covered; k < size && nzeros != 0; k++) {
          const uint32_t ctx =
              histo_offset
              + zero_density_ctx(nzeros, k, covered, log2_covered, prev);
          const uint32_t u = ans.read_clustered_nolz(ans.context_map[ctx]);
          const int32_t v = unpack_signed(u);
          if (v != static_cast<int16_t>(v)) return -12;
          const uint32_t p = static_cast<uint32_t>(order[k]);
          block[(p >> wlog) * row_stride + (p & wmask)] =
              static_cast<int16_t>(v);
          prev = u != 0 ? 1 : 0;
          nzeros -= prev;
        }
      } else {
        for (uint32_t k = covered; k < size && nzeros != 0; k++) {
          const uint32_t ctx =
              histo_offset
              + zero_density_ctx(nzeros, k, covered, log2_covered, prev);
          const uint32_t u = ans.read_clustered(ans.context_map[ctx]);
          const int32_t v = unpack_signed(u);
          if (v != static_cast<int16_t>(v)) return -12;
          const uint32_t p = static_cast<uint32_t>(order[k]);
          block[(p >> wlog) * row_stride + (p & wmask)] =
              static_cast<int16_t>(v);
          prev = u != 0 ? 1 : 0;
          nzeros -= prev;
        }
      }
      if (nzeros != 0) return -11;
    }
  }
  return h->br.overread ? -1 : 0;
}

// ---------------------------------------------------------------------------
// MA-tree split search (enc_ma.cc ComputeBestTree's inner loop): given a
// node's subsampled property matrix and per-predictor residual-class
// matrix, find the (property, quantile-cut) minimizing summed
// token-entropy cost of the best static predictor per side.
// Mirrors frame/ma_learn.py build()'s vectorized numpy search exactly
// (same 9 quantile positions, same cost model, same argmax tie-break).

namespace {

constexpr int kMaClasses = 40;

// n * log2(n) for n in [0, 1<<16); larger falls back to std::log2.
struct XlogxLut {
  std::vector<double> t;
  XlogxLut() : t(1 << 16) {
    t[0] = 0.0;
    for (int i = 1; i < (1 << 16); i++) t[i] = i * std::log2((double)i);
  }
  inline double operator()(int64_t n) const {
    return n < (1 << 16) ? t[n] : n * std::log2((double)n);
  }
};
const XlogxLut kXlogx;

// cost(bits) of a 40-class histogram: entropy + raw bits.
// ent = tot*log2(tot) - sum xlogx(c); raw = sum c*max(cls-1,0) + sum_{cls>=1} c
static inline double ma_hist_cost(const int64_t* h) {
  int64_t tot = 0, raw = 0;
  double sx = 0.0;
  for (int c = 0; c < kMaClasses; c++) {
    const int64_t n = h[c];
    tot += n;
    sx += kXlogx(n);
    if (c >= 1) raw += n * c;  // (c-1) extra bits + 1 sign/presence bit
  }
  if (tot == 0) return 0.0;
  return kXlogx(tot) - sx + (double)raw;
}

}  // namespace

extern "C" {

// feat: (nprops, ns) int32 row-major; cls: (kpred, ns) uint8 row-major.
// out_f: [base_cost, best_gain]; out_i: [base_k, prop_i, splitval, lk, rk]
// prop_i = -1 when no valid cut beats gain 0 (caller applies its own
// split-cost threshold to best_gain).
void ma_split_search(const int32_t* feat, const uint8_t* cls,
                     int nprops, int kpred, int64_t ns,
                     double* out_f, int32_t* out_i) {
  // Base cost: per-predictor histograms over the node.
  std::vector<int64_t> base_h((size_t)kpred * kMaClasses, 0);
  for (int k = 0; k < kpred; k++) {
    const uint8_t* row = cls + (size_t)k * ns;
    int64_t* h = base_h.data() + (size_t)k * kMaClasses;
    for (int64_t i = 0; i < ns; i++) h[row[i]]++;
  }
  double base_cost = 1e300;
  int base_k = 0;
  for (int k = 0; k < kpred; k++) {
    double c = ma_hist_cost(base_h.data() + (size_t)k * kMaClasses);
    if (c < base_cost) { base_cost = c; base_k = k; }
  }

  static const int kQPos[9] = {6, 12, 25, 37, 50, 63, 75, 88, 94};
  const int nq = 9, nb = nq + 1;
  std::vector<int32_t> sorted(ns);
  std::vector<int32_t> qs(nq);
  std::vector<uint8_t> buckets(ns);
  // counts[bucket][pred][cls] for one property at a time.
  std::vector<int64_t> counts((size_t)nb * kpred * kMaClasses);
  std::vector<int64_t> pref((size_t)nb * kpred * kMaClasses);

  double best_gain = 0.0;
  int best_prop = -1, best_sv = 0, best_lk = 0, best_rk = 0;

  for (int pi = 0; pi < nprops; pi++) {
    const int32_t* f = feat + (size_t)pi * ns;
    std::copy(f, f + ns, sorted.begin());
    std::sort(sorted.begin(), sorted.end());
    for (int j = 0; j < nq; j++) qs[j] = sorted[(kQPos[j] * (ns - 1)) / 100];
    // bucket = #{q < v} (searchsorted side=left semantics)
    for (int64_t i = 0; i < ns; i++) {
      const int32_t v = f[i];
      int b = 0;
      while (b < nq && qs[b] < v) b++;
      buckets[i] = (uint8_t)b;
    }
    std::fill(counts.begin(), counts.end(), 0);
    for (int k = 0; k < kpred; k++) {
      const uint8_t* row = cls + (size_t)k * ns;
      for (int64_t i = 0; i < ns; i++) {
        counts[((size_t)buckets[i] * kpred + k) * kMaClasses + row[i]]++;
      }
    }
    // prefix over buckets
    std::copy(counts.begin(), counts.begin() + (size_t)kpred * kMaClasses,
              pref.begin());
    for (int b = 1; b < nb; b++) {
      const int64_t* src = counts.data() + (size_t)b * kpred * kMaClasses;
      const int64_t* prev = pref.data() + (size_t)(b - 1) * kpred * kMaClasses;
      int64_t* dst = pref.data() + (size_t)b * kpred * kMaClasses;
      for (int j = 0; j < kpred * kMaClasses; j++) dst[j] = prev[j] + src[j];
    }
    const int64_t* total = pref.data() + (size_t)(nb - 1) * kpred * kMaClasses;
    // Cut j (j in [0, nq)): right = pref[j], left = total - right.
    for (int j = 0; j < nq; j++) {
      const int64_t* right = pref.data() + (size_t)j * kpred * kMaClasses;
      double lmin = 1e300, rmin = 1e300;
      int lk = 0, rk = 0;
      int64_t lsz = 0, rsz = 0;
      int64_t lh[kMaClasses];
      for (int k = 0; k < kpred; k++) {
        const int64_t* rh = right + (size_t)k * kMaClasses;
        const int64_t* th = total + (size_t)k * kMaClasses;
        int64_t rs = 0;
        for (int c = 0; c < kMaClasses; c++) {
          lh[c] = th[c] - rh[c];
          rs += rh[c];
        }
        double rc = ma_hist_cost(rh);
        double lc = ma_hist_cost(lh);
        if (rc < rmin) { rmin = rc; rk = k; }
        if (lc < lmin) { lmin = lc; lk = k; }
        if (k == 0) {
          rsz = rs;
          int64_t ls = 0;
          for (int c = 0; c < kMaClasses; c++) ls += lh[c];
          lsz = ls;
        }
      }
      if (lsz == 0 || rsz == 0) continue;
      const double gain = base_cost - lmin - rmin;
      if (gain > best_gain) {
        best_gain = gain;
        best_prop = pi;
        best_sv = qs[j];
        best_lk = lk;
        best_rk = rk;
      }
    }
  }
  out_f[0] = base_cost;
  out_f[1] = best_gain;
  out_i[0] = base_k;
  out_i[1] = best_prop;
  out_i[2] = best_sv;
  out_i[3] = best_lk;
  out_i[4] = best_rk;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// EPF-sharpness selection (enc_heuristics.cc ComputeARHeuristics): given
// per-candidate block error maps, the two greedy passes (top/left reuse
// preference, then context-frequency reweighting) + the uniform-field
// guard. Mirrors frame/ar_heuristic.py's Python loops exactly.

extern "C" {

void ar_sharpness_select(const double* err /* (ns, by*bx) */,
                         const int32_t* steps, int ns, int64_t by,
                         int64_t bx, double favor_no_smoothing, double c5,
                         double c3, double clamped, int32_t* out) {
  int lut[8] = {0};
  for (int i = 0; i < ns; i++) lut[steps[i] & 7] = i;
  const int64_t n = by * bx;
  int64_t histo[9][8] = {{0}};
  int64_t totals[9];
  for (int i = 0; i < 9; i++) totals[i] = 1;
  // Pass 1: greedy with top/left reuse preference.
  for (int64_t y = 0; y < by; y++) {
    for (int64_t x = 0; x < bx; x++) {
      const int top_val = y > 0 ? out[(y - 1) * bx + x] : 0;
      const int left_val = x > 0 ? out[y * bx + x - 1] : 0;
      int best_val = 0;
      double best_error = 1e300;
      for (int s = 0; s < ns; s++) {
        double e = err[s * n + y * bx + x];
        if (steps[s] == 0) e *= favor_no_smoothing;
        if (e < best_error) { best_val = steps[s]; best_error = e; }
      }
      const double top_error = err[(int64_t)lut[top_val & 7] * n
                                   + y * bx + x];
      const double left_error = err[(int64_t)lut[left_val & 7] * n
                                    + y * bx + x];
      int chosen;
      if (best_error < std::min(top_error, left_error)) chosen = best_val;
      else if (top_error < left_error) chosen = top_val;
      else chosen = left_val;
      out[y * bx + x] = chosen;
      const int ctx = lut[top_val & 7] * 3 + lut[left_val & 7];
      histo[ctx][chosen & 7]++;
      totals[ctx]++;
    }
  }
  // Context-frequency reweighting.
  double mul[27] = {0};
  for (int ti = 0; ti < ns; ti++) {
    for (int li = 0; li < ns; li++) {
      const int ctx = ti * 3 + li;
      for (int vi = 0; vi < ns; vi++) {
        const int val = steps[vi];
        const int ix = vi + 3 * ctx;
        mul[ix] = 1.0 / (1.0 + c5 * std::log1p(
            (double)histo[ctx][val & 7] / (double)totals[ctx]) / clamped);
        if (val == 0) mul[ix] *= c3;
      }
    }
  }
  // Pass 2.
  for (int64_t y = 0; y < by; y++) {
    for (int64_t x = 0; x < bx; x++) {
      const int top_val = y > 0 ? out[(y - 1) * bx + x] : 0;
      const int left_val = x > 0 ? out[y * bx + x - 1] : 0;
      const int ctx = lut[top_val & 7] * 3 + lut[left_val & 7];
      int best_val = 0;
      double best_error = 1e300;
      for (int s = 0; s < ns; s++) {
        const double e = err[s * n + y * bx + x] * mul[s + 3 * ctx];
        if (e < best_error) { best_val = steps[s]; best_error = e; }
      }
      out[y * bx + x] = best_val;
    }
  }
  // The uniform-field guard stays in Python (numpy pairwise summation
  // keeps it bit-identical to the reference implementation there).
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Encoder input conversion + gaborish inverse (enc_xyb.cc LinearRGBToXYB,
// enc_gaborish.cc GaborishInverse). Scalar f64 math in the exact
// operation order of the numpy reference (color/xyb.py,
// frame/adaptive_quant.py); outputs are f32, which absorbs any last-ULP
// f64 contraction differences.

extern "C" {

// interleaved sRGB u8 (H, W, 3) -> planar XYB f32 (3, H, W).
// lut: 256-entry float32 sRGB->linear table (built host-side so it is
// bit-identical to the numpy LUT); m: 3x3 f64 opsin matrix; bias: f64.
void srgb8_to_xyb(const uint8_t* rgb, int64_t n, const float* lut,
                  const double* m, const double* bias,
                  const double* cbrt_bias, float* out) {
  for (int64_t i = 0; i < n; i++) {
    const double r = (double)lut[rgb[i * 3]];
    const double g = (double)lut[rgb[i * 3 + 1]];
    const double b = (double)lut[rgb[i * 3 + 2]];
    double mix0 = m[0] * r + m[1] * g + m[2] * b + bias[0];
    double mix1 = m[3] * r + m[4] * g + m[5] * b + bias[1];
    double mix2 = m[6] * r + m[7] * g + m[8] * b + bias[2];
    mix0 = mix0 < 0 ? 0 : mix0;
    mix1 = mix1 < 0 ? 0 : mix1;
    mix2 = mix2 < 0 ? 0 : mix2;
    const double c0 = std::cbrt(mix0) - cbrt_bias[0];
    const double c1 = std::cbrt(mix1) - cbrt_bias[1];
    const double c2 = std::cbrt(mix2) - cbrt_bias[2];
    out[i] = (float)(0.5 * (c0 - c1));
    out[n + i] = (float)(0.5 * (c0 + c1));
    out[2 * n + i] = (float)c2;
  }
}

// 5x5 symmetric-pad convolution: img (3, H, W) f32, kernel 25 f64
// (zeros skipped in the SAME dy-major order as the numpy tap loop),
// f64 accumulate, f32 store.
void gaborish_inverse_f32(const float* img, int64_t h, int64_t w,
                          const double* ker, float* out) {
  // Precompute symmetric-reflected index maps for the +-2 borders.
  auto reflect = [](int64_t t, int64_t nn) {
    if (t < 0) return -1 - t;
    if (t >= nn) return 2 * nn - 1 - t;
    return t;
  };
  std::vector<int32_t> xm(w + 4);
  for (int64_t x = 0; x < w + 4; x++)
    xm[x] = (int32_t)reflect(x - 2, w);
  for (int c = 0; c < 3; c++) {
    const float* p = img + (size_t)c * h * w;
    float* o = out + (size_t)c * h * w;
    for (int64_t y = 0; y < h; y++) {
      const float* rows[5];
      for (int dy = 0; dy < 5; dy++)
        rows[dy] = p + (size_t)reflect(y + dy - 2, h) * w;
      for (int64_t x = 0; x < w; x++) {
        double acc = 0.0;
        for (int dy = 0; dy < 5; dy++) {
          const float* row = rows[dy];
          const double* kr = ker + dy * 5;
          for (int dx = 0; dx < 5; dx++) {
            const double kv = kr[dx];
            if (kv != 0.0) acc += kv * (double)row[xm[x + dx]];
          }
        }
        o[y * w + x] = (float)acc;
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Full-frame VarDCT reconstruction: fused dequant + AdjustQuantBias +
// CfL + LLF-from-DC + per-strategy IDCT + pixel scatter in ONE pass
// over the dense stored-layout coefficient frame (the layout
// vardct_decode_ac_frame writes). Replaces the numpy block
// reconstruction (vardct/reconstruct.py reconstruct_group) on the
// host decode path: dec_group.cc DequantBlock + TransformToPixels
// semantics, block-at-a-time so every buffer stays L1-resident.

namespace {

// pix = I8 @ G^T @ I8^T for one 8x8 block (stored grid transposed:
// square DCTs store (hfreq, vfreq) per the coefficient-layout rule).
// Computed as P = (I8 @ G) @ I8^T followed by a transposed 8x8 store
// (pix = P^T) so every inner loop runs over contiguous rows.
static inline void idct8x8_stored(const float* __restrict g /*64*/,
                                  const float* __restrict i8 /*8x8*/,
                                  float* __restrict pix /*64*/) {
  float t[64];  // t = I8 @ G: t[y] += I8[y][v] * G[v]
  for (int y = 0; y < 8; y++) {
    float* tr = t + y * 8;
    for (int k = 0; k < 8; k++) tr[k] = 0.f;
    const float* ir = i8 + y * 8;
    for (int v = 0; v < 8; v++) {
      const float a = ir[v];
      const float* gr = g + v * 8;
      for (int k = 0; k < 8; k++) tr[k] += a * gr[k];
    }
  }
  // p[y][x] = sum_u t[y][u] * I8[x][u] as a saxpy over x (the
  // u-reduction stays in sequential order per element, so results
  // match the dot formulation bit-for-bit while vectorizing across x).
  for (int y = 0; y < 8; y++) {
    const float* tr = t + y * 8;
    float pr[8] = {0.f};
    for (int u = 0; u < 8; u++) {
      const float a = tr[u];
      for (int x = 0; x < 8; x++) pr[x] += a * i8[x * 8 + u];
    }
    for (int x = 0; x < 8; x++) pix[x * 8 + y] = pr[x];
  }
}

// Branchless fused AdjustQuantBias + dequant of one row: |v| <= 1
// collapses to bias_c * v (gives -bc/0/+bc), otherwise v - b3/v; same
// multiply association as the numpy chain (((biased * tb) * sc) * q).
template <typename T>
static inline void dequant_row(const T* __restrict src,
                               const float* __restrict tb, float sc,
                               float q, float bc, float b3,
                               float* __restrict o, int n) {
  for (int k = 0; k < n; k++) {
    const float x = (float)src[k];
    const float gen = x - b3 / x;  // x == 0 -> non-finite, masked below
    const float sml = bc * x;
    const float ax = x < 0.f ? -x : x;
    const float biased = ax <= 1.f ? sml : gen;
    o[k] = ((biased * tb[k]) * sc) * q;
  }
}

template <typename T>
static void reconstruct_frame_impl(
    const T* coeff, int64_t BH, int64_t BW, const int32_t* strategies,
    const int32_t* raw_quant, const float* dc, const float* fx_map,
    const float* fb_map, int64_t TW, float inv_global_scale, float qmx,
    float qmb, const double* biases, const float* tables,
    const int64_t* table_off, const float* fam8, const int8_t* slot_lut,
    const int32_t* covx, const int32_t* covy, const float* i8mat,
    const float* fblob, const int64_t* ih_off, const int64_t* iw_off,
    const double* dblob, const int64_t* mcy_off, const int64_t* mcx_off,
    const int64_t* sy_off, const int64_t* sx_off, float* out,
    int64_t out_h, int64_t out_w) {
  const float b3 = (float)biases[3];
  const float bias_c[3] = {(float)biases[0], (float)biases[1],
                           (float)biases[2]};
  const float qm[3] = {qmx, 1.0f, qmb};
  const int64_t W = BW * 8;
  const int64_t cplane = BH * 8 * W;
  const int64_t oplane = out_h * out_w;
  static const int chan_order[3] = {1, 0, 2};
  // Scratch sized for the largest block (256x256 = 65536/channel).
  std::vector<float> dqbuf, gbuf, t1buf, pixbuf;
  for (int64_t by = 0; by < BH; by++) {
    for (int64_t bx = 0; bx < BW; bx++) {
      const int s = strategies[by * BW + bx];
      if (s < 0) continue;
      const float sc = inv_global_scale / (float)raw_quant[by * BW + bx];
      const float fxv = fx_map[(by >> 3) * TW + (bx >> 3)];
      const float fbv = fb_map[(by >> 3) * TW + (bx >> 3)];
      const float* tb = tables + table_off[s];
      const int slot = slot_lut[s];
      const int64_t corig = by * 8 * W + bx * 8;
      if (slot >= 0) {
        // 8x8 family: dequant 3x64 (Y first for CfL), DC into slot 0,
        // then separable IDCT (DCT8X8) or 64x64 bank matvec.
        float dq[3][64];
        for (int ci = 0; ci < 3; ci++) {
          const int c = chan_order[ci];
          float* o = dq[c];
          for (int r = 0; r < 8; r++)
            dequant_row(coeff + c * cplane + corig + r * W,
                        tb + c * 64 + r * 8, sc, qm[c], bias_c[c], b3,
                        o + r * 8, 8);
          if (c == 0)
            for (int k = 0; k < 64; k++) o[k] += fxv * dq[1][k];
          else if (c == 2)
            for (int k = 0; k < 64; k++) o[k] += fbv * dq[1][k];
          o[0] = dc[c * BH * BW + by * BW + bx];
        }
        float pix[64];
        for (int c = 0; c < 3; c++) {
          if (slot == 0) {
            idct8x8_stored(dq[c], i8mat, pix);
          } else {
            const float* M = fam8 + (size_t)slot * 64 * 64;
            for (int j = 0; j < 64; j++) pix[j] = 0.f;
            for (int k = 0; k < 64; k++) {
              const float v = dq[c][k];
              if (v == 0.f) continue;
              const float* Mr = M + k * 64;
              for (int j = 0; j < 64; j++) pix[j] += v * Mr[j];
            }
          }
          float* op = out + c * oplane + by * 8 * out_w + bx * 8;
          for (int r = 0; r < 8; r++)
            for (int k = 0; k < 8; k++) op[r * out_w + k] = pix[r * 8 + k];
        }
        continue;
      }
      // Big plain DCT: stored grid is (ly*8, lx*8) with ly=min, lx=max.
      const int cxk = covx[s], cyk = covy[s];
      const int fh = cyk * 8, fw = cxk * 8;
      const int ly = cyk < cxk ? cyk : cxk, lx = cyk < cxk ? cxk : cyk;
      const int size = fh * fw;
      dqbuf.resize(3 * (size_t)size);
      gbuf.resize((size_t)size);
      t1buf.resize((size_t)size);
      pixbuf.resize((size_t)size);
      // Dequant straight from the covered rect (row-major == linear
      // stored order), Y first.
      for (int ci = 0; ci < 3; ci++) {
        const int c = chan_order[ci];
        float* o = dqbuf.data() + (size_t)c * size;
        for (int r = 0; r < fh; r++)
          dequant_row(coeff + c * cplane + corig + (int64_t)r * W,
                      tb + (size_t)c * size + (size_t)r * fw, sc, qm[c],
                      bias_c[c], b3, o + (size_t)r * fw, fw);
        if (c == 0) {
          const float* yq = dqbuf.data() + size;
          for (int k = 0; k < size; k++) o[k] += fxv * yq[k];
        } else if (c == 2) {
          const float* yq = dqbuf.data() + size;
          for (int k = 0; k < size; k++) o[k] += fbv * yq[k];
        }
      }
      // LLF from DC (double, matching the numpy einsum chain):
      // coefdc = mcy @ dcs @ mcx^T, scaled; placed (transposed when
      // cy >= cx) into the stored grid's [:ly, :lx] corner.
      const double* mcy = dblob + mcy_off[s];
      const double* mcx = dblob + mcx_off[s];
      const double* syv = dblob + sy_off[s];
      const double* sxv = dblob + sx_off[s];
      const float* ih = fblob + ih_off[s];
      const float* iw = fblob + iw_off[s];
      for (int c = 0; c < 3; c++) {
        float* g = dqbuf.data() + (size_t)c * size;  // stored (ly8, lx8)
        double tmp[32 * 32];  // cy, cx <= 32
        for (int u = 0; u < cyk; u++) {
          for (int j = 0; j < cxk; j++) {
            double acc = 0.0;
            for (int i = 0; i < cyk; i++)
              acc += mcy[u * cyk + i] *
                     (double)dc[c * BH * BW + (by + i) * BW + (bx + j)];
            tmp[u * cxk + j] = acc;
          }
        }
        for (int u = 0; u < cyk; u++) {
          for (int v = 0; v < cxk; v++) {
            double acc = 0.0;
            for (int j = 0; j < cxk; j++)
              acc += tmp[u * cxk + j] * mcx[v * cxk + j];
            const double llf = acc * syv[u] * sxv[v];
            // stored position: (u, v) when cy < cx, else (v, u).
            if (cyk >= cxk)
              g[v * (lx * 8) + u] = (float)llf;
            else
              g[u * (lx * 8) + v] = (float)llf;
          }
        }
        // Logical grid (fh, fw): stored^T when cy >= cx.
        const float* G;
        if (cyk >= cxk) {
          float* gt = gbuf.data();
          for (int r = 0; r < ly * 8; r++)
            for (int k = 0; k < lx * 8; k++)
              gt[k * (ly * 8) + r] = g[r * (lx * 8) + k];
          G = gt;
        } else {
          G = g;
        }
        // pix = (IH @ G) @ IW^T, float32 like the numpy sgemm chain.
        float* __restrict t1 = t1buf.data();
        for (int y = 0; y < fh; y++) {
          float* __restrict t1r = t1 + (size_t)y * fw;
          for (int k = 0; k < fw; k++) t1r[k] = 0.f;
          const float* ihr = ih + (size_t)y * fh;
          for (int u = 0; u < fh; u++) {
            const float a = ihr[u];
            if (a == 0.f) continue;
            const float* Gr = G + (size_t)u * fw;
            for (int k = 0; k < fw; k++) t1r[k] += a * Gr[k];
          }
        }
        float* __restrict pix = pixbuf.data();
        // pix = t1 @ IW^T with iwt = IW^T pre-transposed host-side:
        // saxpy over x per v keeps the v-accumulation order of the
        // dot form (bit-identical) while vectorizing across x.
        for (int y = 0; y < fh; y++) {
          const float* t1r = t1 + (size_t)y * fw;
          float* __restrict pr = pix + (size_t)y * fw;
          for (int x = 0; x < fw; x++) pr[x] = 0.f;
          for (int v = 0; v < fw; v++) {
            const float a = t1r[v];
            if (a == 0.f) continue;
            const float* iwr = iw + (size_t)v * fw;  // row v of IW^T
            for (int x = 0; x < fw; x++) pr[x] += a * iwr[x];
          }
        }
        float* op = out + c * oplane + by * 8 * out_w + bx * 8;
        for (int r = 0; r < fh; r++)
          for (int k = 0; k < fw; k++) op[(int64_t)r * out_w + k] =
              pix[(size_t)r * fw + k];
      }
    }
  }
}

}  // namespace

extern "C" {

// coeff16/coeff32: exactly one non-null; (3, BH*8, BW*8) dense
// stored-layout coefficient frame (each block's linear coefficient
// buffer written row-major over its covered rect).
// strategies/raw_quant: (BH, BW) int32, anchors >= 0 / covered < 0.
// dc: (3, BH, BW) f32 dequantized DC. fx/fb_map: (TH, TW) f32
// premultiplied per-tile CfL factors (tile = 8x8 blocks).
// tables+table_off[64]: packed (3, size) f32 dequant tables per
// strategy id (-1 = unused). fam8: (10, 64, 64) pixels = coeffs @ M.
// slot_lut[64]: strategy -> family8 bank slot or -1. covx/covy[64].
// fblob+ih_off/iw_off[64]: f32 idct matrices (fh*fh)/(fw*fw) per big
// strategy. dblob+mcy/mcx/sy/sx_off[64]: f64 LLF factors (dct_matrix
// cy*cy / cx*cx, resample scales cy / cx).
// out: (3, out_h, out_w) f32, written in [0, BH*8) x [0, BW*8).
void reconstruct_frame(
    const int16_t* coeff16, const int32_t* coeff32, int64_t BH, int64_t BW,
    const int32_t* strategies, const int32_t* raw_quant, const float* dc,
    const float* fx_map, const float* fb_map, int64_t TW,
    float inv_global_scale, float qmx, float qmb, const double* biases,
    const float* tables, const int64_t* table_off, const float* fam8,
    const int8_t* slot_lut, const int32_t* covx, const int32_t* covy,
    const float* i8mat, const float* fblob, const int64_t* ih_off,
    const int64_t* iw_off, const double* dblob, const int64_t* mcy_off,
    const int64_t* mcx_off, const int64_t* sy_off, const int64_t* sx_off,
    float* out, int64_t out_h, int64_t out_w) {
  if (coeff16)
    reconstruct_frame_impl(coeff16, BH, BW, strategies, raw_quant, dc,
                           fx_map, fb_map, TW, inv_global_scale, qmx, qmb,
                           biases, tables, table_off, fam8, slot_lut, covx,
                           covy, i8mat, fblob, ih_off, iw_off, dblob,
                           mcy_off, mcx_off, sy_off, sx_off, out, out_h,
                           out_w);
  else
    reconstruct_frame_impl(coeff32, BH, BW, strategies, raw_quant, dc,
                           fx_map, fb_map, TW, inv_global_scale, qmx, qmb,
                           biases, tables, table_off, fam8, slot_lut, covx,
                           covy, i8mat, fblob, ih_off, iw_off, dblob,
                           mcy_off, mcx_off, sy_off, sx_off, out, out_h,
                           out_w);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Adaptive-quantization field (enc_adaptive_quantization.cc
// InitialQuantField + ComputeMask/GammaModulation/HfModulation/
// BlueModulation/FuzzyErosion): single fused native pass replacing
// ~20 whole-image float64 numpy temporaries in
// frame/adaptive_quant.py initial_quant_field. Formulas and constants
// mirror the Python (which mirrors the reference); block sums are
// sequential-order (the numpy pairwise-sum difference is ~1e-15
// relative and only moves a raw_quant integer on exact ties).

namespace {

static const double kInvLog2e = 0.6931471805599453;
static const double kSGMul = 226.77216153508914;
static const double kSGMul2 = 1.0 / 73.377132366608819;
static const double kSGRetMul = kSGMul2 * 18.6580932135 * kInvLog2e;
static const double kSGVOffset = 7.7825991679894591;

static inline double rod_cubic(double v, bool invert) {
  // RatioOfDerivativesOfCubicRootToSimpleGamma
  const double eps = 1e-2;
  v = v < 0.0 ? 0.0 : v;
  const double num_mul = kSGRetMul * 3.0 * kSGMul;
  const double v_offset = kSGVOffset * kInvLog2e + eps;
  const double den_mul = kInvLog2e * kSGMul;
  const double v2 = v * v;
  const double num = num_mul * v2 + eps;
  const double den = den_mul * v * v2 + v_offset;
  return invert ? num / den : den / num;
}

}  // namespace

extern "C" {

// xyb: (3, h, w) f32, h/w multiples of 8; qf out: (h/8, w/8) f32.
void aq_initial_quant_field(const float* xyb, int64_t h, int64_t w,
                            double bt, double rescale, double steepen,
                            float* qf) {
  const int64_t n = h * w;
  const float* xp = xyb;
  const float* yp = xyb + n;
  const float* bp = xyb + 2 * n;
  const int64_t h4 = h / 4, w4 = w / 4, hb = h / 8, wb = w / 8;
  const double match_gamma_offset = 0.019;
  const double limit = 0.2;
  const double kLogOffset = 27.505837037000106;
  const double kMulRoot = std::sqrt(211.66567973503678 * 1e8);

  // Pass A: per-pixel masking diff, accumulated into 4x4 tiles * 0.25.
  std::vector<double> pre(h4 * w4, 0.0);
  for (int64_t y = 0; y < h; y++) {
    const float* row = yp + y * w;
    const float* rup = yp + (y == 0 ? 0 : y - 1) * w;
    const float* rdn = yp + (y == h - 1 ? y : y + 1) * w;
    double* prow = pre.data() + (y / 4) * w4;
    for (int64_t x = 0; x < w; x++) {
      const double l = row[x == 0 ? 0 : x - 1];
      const double r = row[x == w - 1 ? x : x + 1];
      const double base = 0.25 * ((double)rup[x] + (double)rdn[x] + l + r);
      const double gammac =
          rod_cubic((double)row[x] + match_gamma_offset, false);
      double diff = gammac * ((double)row[x] - base);
      diff = diff * diff;
      diff = diff < limit ? diff : limit;
      diff = 0.25 * std::sqrt(diff * kMulRoot + kLogOffset);
      prow[x / 4] += 0.25 * diff;
    }
  }

  // Pass B: FuzzyErosion — weighted sum of the 4 smallest of each 3x3
  // neighborhood (edge-padded), then 2x2 accumulate -> aq_map (hb, wb).
  double kMul[4] = {0.125, 0.1, 0.09, 0.06};
  {
    const double kAdd[4] = {0.0, -0.1, -0.09, -0.06};
    const double mul =
        bt < 2.0 ? ((2.0 - bt) / 2.0 > 0.0 ? (2.0 - bt) / 2.0 : 0.0) : 0.0;
    double s = 0.0;
    for (int i = 0; i < 4; i++) {
      kMul[i] += mul * kAdd[i];
      s += kMul[i];
    }
    const double norm = 0.29959705784054957 / s;
    for (int i = 0; i < 4; i++) kMul[i] *= norm;
  }
  std::vector<double> aq(hb * wb, 0.0);
  for (int64_t y = 0; y < h4; y++) {
    const int64_t ym = y == 0 ? 0 : y - 1;
    const int64_t yq = y == h4 - 1 ? y : y + 1;
    double* arow = aq.data() + (y / 2) * wb;
    for (int64_t x = 0; x < w4; x++) {
      const int64_t xm = x == 0 ? 0 : x - 1;
      const int64_t xq = x == w4 - 1 ? x : x + 1;
      const double nb[9] = {
          pre[ym * w4 + xm], pre[ym * w4 + x], pre[ym * w4 + xq],
          pre[y * w4 + xm],  pre[y * w4 + x],  pre[y * w4 + xq],
          pre[yq * w4 + xm], pre[yq * w4 + x], pre[yq * w4 + xq]};
      // 4 smallest, ascending (insertion into a fixed-size window).
      double s0 = 1e300, s1 = 1e300, s2 = 1e300, s3 = 1e300;
      for (int i = 0; i < 9; i++) {
        double v = nb[i];
        if (v < s3) {
          if (v < s2) { s3 = s2;
            if (v < s1) { s2 = s1;
              if (v < s0) { s1 = s0; s0 = v; } else s1 = v;
            } else s2 = v;
          } else s3 = v;
        }
      }
      arow[x / 2] += kMul[0] * s0 + kMul[1] * s1 + kMul[2] * s2 +
                     kMul[3] * s3;
    }
  }

  // Pass C: per-block mask chain + per-pixel modulations.
  const double scale = 0.765 / bt * rescale;
  double dampen = 1.0;
  if (bt >= 2.0) {
    dampen = 1.0 - (bt - 2.0) / 12.0;
    if (dampen < 0.0) dampen = 0.0;
  }
  const double mul_ = scale * dampen;
  const double add_ = (1.0 - dampen) * (0.48 * scale);
  std::vector<double> outv(hb * wb);
  for (int64_t by = 0; by < hb; by++) {
    for (int64_t bx = 0; bx < wb; bx++) {
      // ComputeMask
      const double kBase = -0.7647, kMul4 = 9.4708735624378946,
                   kMul2 = 17.35036561631863,
                   kOffset2 = 302.59587815579727,
                   kMul3 = 6.7943250517376494,
                   kOffset3 = 3.7179635626140772,
                   kOffset4 = 0.25 * kOffset3,
                   kMul0 = 0.80061762862741759;
      double v1 = aq[by * wb + bx] * kMul0;
      if (v1 < 1e-3) v1 = 1e-3;
      double mask = kBase + kMul4 / (v1 * v1 + kOffset4) +
                    kMul2 / (v1 + kOffset2) + kMul3 / (v1 * v1 + kOffset3);
      // Per-pixel sums over the 8x8 block.
      const double kBias = 0.16;
      double gsum = 0.0, hsum = 0.0, bsum = 0.0;
      for (int dy = 0; dy < 8; dy++) {
        const int64_t yy = by * 8 + dy;
        const float* yr = yp + yy * w + bx * 8;
        const float* xr = xp + yy * w + bx * 8;
        const float* br = bp + yy * w + bx * 8;
        const float* yr1 =
            dy < 7 ? yp + (yy + 1) * w + bx * 8 : yr;  // used when dy<7
        for (int dx = 0; dx < 8; dx++) {
          const double iny = (double)yr[dx] + kBias;
          gsum += rod_cubic(iny - (double)xr[dx], true) +
                  rod_cubic(iny + (double)xr[dx], true);
          // Hf: capped right/down deltas, excluding block-crossing.
          const double valmin = 0.0206;
          if (dx < 7) {
            double d = (double)yr[dx + 1] - (double)yr[dx];
            d = d < 0 ? -d : d;
            hsum += d < valmin ? d : valmin;
          }
          if (dy < 7) {
            double d = (double)yr1[dx] - (double)yr[dx];
            d = d < 0 ? -d : d;
            hsum += d < valmin ? d : valmin;
          }
          // Blue
          const double kLimit = 0.010474084867598155;
          const double kOffsetB = 0.0031994768654636393;
          const double ax = xr[dx] < 0 ? -(double)xr[dx] : (double)xr[dx];
          const double p_y_eff = (double)yr[dx] + kOffsetB + ax;
          if ((double)br[dx] > p_y_eff) {
            const double c = (double)br[dx] - p_y_eff;
            bsum += c < kLimit ? c : kLimit;
          }
        }
      }
      // GammaModulation
      double overall = gsum * (0.5 / 64.0);
      if (overall < 1e-9) overall = 1e-9;
      const double mask_g =
          mask + 0.1005613337192697 * (std::log2(overall));
      // HfModulation
      const double out_hf = mask_g + hsum * -0.38 + 0.42;
      // BlueModulation
      const double kLimit = 0.010474084867598155;
      double s = bsum;
      if (s >= 32 * kLimit) s = 64 * kLimit - s;
      const double smax = 15.463398341612438 * kLimit;
      if (s > smax) s = smax;
      const double out_blue = mask_g + s * 0.90590804735610064;
      outv[by * wb + bx] = out_hf < out_blue ? out_hf : out_blue;
    }
  }
  if (steepen != 1.0) {
    // Median via nth_element on a copy, then low-side amplification.
    std::vector<double> cp(outv);
    const size_t mid = cp.size() / 2;
    std::nth_element(cp.begin(), cp.begin() + mid, cp.end());
    double med = cp[mid];
    if (cp.size() % 2 == 0) {
      std::nth_element(cp.begin(), cp.begin() + mid - 1, cp.end());
      med = 0.5 * (med + cp[mid - 1]);
    }
    for (auto& v : outv)
      v = v + (steepen - 1.0) * (v - med < 0.0 ? v - med : 0.0);
  }
  for (int64_t i = 0; i < hb * wb; i++)
    qf[i] = (float)(std::exp(outv[i]) * mul_ + add_);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Encoder-side ANS build-info tables (enc_ans.cc ANSBuildInfoTable):
// for every clustered histogram, the reverse map
// rmap[rmap_off[h][s] + offset] = residue is derived from the SAME
// packed alias construction the decoder uses (build_alias_packed), so
// encoder and decoder stay symmetric by construction. Replaces the
// per-cluster Python init_alias_table + build_reverse_maps chain.

extern "C" {

// counts: (m, alpha) int32 normalized histograms (each row sums to
// kAnsTabSize). rmap: (m * kAnsTabSize) uint32. rmap_off: (m, alpha)
// uint32 GLOBAL offsets into rmap. Returns 0 or a negative error.
int ans_encoder_tables(const int32_t* counts, int m, int alpha,
                       int log_alpha_size, uint32_t* rmap,
                       uint32_t* rmap_off) {
  std::vector<uint32_t> packed(kAnsTabSize);
  for (int h = 0; h < m; h++) {
    const int32_t* cnt = counts + (size_t)h * alpha;
    const int rc =
        build_alias_packed(cnt, alpha, log_alpha_size, packed.data());
    if (rc != 0) return rc;
    uint32_t off = (uint32_t)h * kAnsTabSize;
    uint32_t* ro = rmap_off + (size_t)h * alpha;
    for (int s = 0; s < alpha; s++) {
      ro[s] = off;
      off += cnt[s] > 0 ? (uint32_t)cnt[s] : 0;
    }
    for (uint32_t res = 0; res < kAnsTabSize; res++) {
      const uint32_t slot = packed[res];
      const uint32_t sym = slot & 0xFF;
      const uint32_t o = (slot >> 8) & 0xFFF;
      rmap[ro[sym] + o] = res;
    }
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// ACS per-pixel masking field (enc_adaptive_quantization.cc
// ComputeTile mask1x1 + Blur1x1Masking): m = 1/(log1p(|gammac *
// laplacian|) + 0.01), then a 5x5 symmetric-pad blur. Mirrors
// frame/acs_select.py masking_1x1 (float64 end to end).

extern "C" {

// y: (h, w) f64 Y plane; ker: 25 f64 (zeros skipped); out: (h, w) f64.
void acs_mask1x1(const double* y, int64_t h, int64_t w,
                 const double* ker, double* out) {
  std::vector<double> m((size_t)h * w);
  for (int64_t i = 0; i < h; i++) {
    const double* row = y + i * w;
    const double* rup = y + (i == 0 ? 0 : i - 1) * w;
    const double* rdn = y + (i == h - 1 ? i : i + 1) * w;
    double* mr = m.data() + i * w;
    for (int64_t x = 0; x < w; x++) {
      const double l = row[x == 0 ? 0 : x - 1];
      const double r = row[x == w - 1 ? x : x + 1];
      const double base = 0.25 * (rup[x] + rdn[x] + l + r);
      const double gammac = rod_cubic(row[x] + 0.019, false);
      const double d = gammac * (row[x] - base);
      const double diff = std::log1p(d < 0 ? -d : d);
      mr[x] = 1.0 / (diff + 0.01);
    }
  }
  // 5x5 blur with symmetric padding ([a b] -> [b a | a b]).
  auto reflect = [](int64_t t, int64_t nn) {
    if (t < 0) return -1 - t;
    if (t >= nn) return 2 * nn - 1 - t;
    return t;
  };
  std::vector<int32_t> xm(w + 4);
  for (int64_t x = 0; x < w + 4; x++)
    xm[x] = (int32_t)reflect(x - 2, w);
  for (int64_t i = 0; i < h; i++) {
    const double* rows[5];
    for (int dy = 0; dy < 5; dy++)
      rows[dy] = m.data() + (size_t)reflect(i + dy - 2, h) * w;
    double* o = out + i * w;
    for (int64_t x = 0; x < w; x++) o[x] = 0.0;
    for (int dy = 0; dy < 5; dy++) {
      const double* kr = ker + dy * 5;
      const double* row = rows[dy];
      for (int dx = 0; dx < 5; dx++) {
        const double kv = kr[dx];
        if (kv == 0.0) continue;
        for (int64_t x = 0; x < w; x++) o[x] += kv * row[xm[x + dx]];
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// AdjustQuantBlockAC (enc_group.cc:104-330) over all batched DCT8
// blocks: trial-quantization statistics drive per-block quant tweaks
// (dead-zone error bound, HF pattern boost, flat-block blockiness fix,
// activity-based reduction). Mirrors encode_frame._adjust_quant_blocks
// (float64; np.round's half-even == nearbyint under FE_TONEAREST).

extern "C" {

// coeffs: (3, N, 64) f64 (DCT coefficients, block-major);
// flat_inv: (3, 64) f64; raw_quant: N int32; dct8_mask: N uint8;
// out: new_rq N int32, thr_y (N, 4) f32.
void adjust_quant_blocks(const double* coeffs, const double* flat_inv,
                         const int32_t* raw_quant, double inv_gs,
                         double x_mul, double b_mul,
                         const uint8_t* dct8_mask, int32_t quant_max,
                         int64_t N, int32_t* new_rq, float* thr_y) {
  // Per-position LUTs.
  int quad[64];
  bool hfr[64];
  for (int k = 0; k < 64; k++) {
    const int row = k / 8, col = k % 8;
    quad[k] = (row >= 4 ? 2 : 0) + (col >= 4 ? 1 : 0);
    hfr[k] = ((row >= 7 && col >= 7) ||
              ((row == 7 || col == 7) && row >= 4 && col >= 4));
  }
  static const double kTrialThr[4] = {0.58, 0.64, 0.64, 0.64};
  static const int chan_order[3] = {1, 0, 2};
  const double qmul[3] = {x_mul, 1.0, b_mul};
  const double hf_mul[3] = {70.0, 30.0, 60.0};
  for (int64_t n = 0; n < N; n++) {
    const double quant0 = (double)raw_quant[n];
    const double scale0 = quant0 / inv_gs;
    double quant_final = 0.0;
    double thr[4] = {kTrialThr[0], kTrialThr[1], kTrialThr[2],
                     kTrialThr[3]};
    for (int ci = 0; ci < 3; ci++) {
      const int c = chan_order[ci];
      const double s = scale0 * qmul[c];
      const double* cf = coeffs + ((size_t)c * N + n) * 64;
      const double* fi = flat_inv + (size_t)c * 64;
      double hfnz[4] = {0, 0, 0, 0};
      double hfme[4] = {0, 0, 0, 0};
      double sum_vals = 0.0, sum_hf = 0.0;
      double val_b[64], v_b[64];
      for (int k = 0; k < 64; k++) {
        const double val = (cf[k] * fi[k]) * s;
        const double av0 = val < 0 ? -val : val;
        const double v = av0 >= kTrialThr[quad[k]] ? nearbyint(val) : 0.0;
        val_b[k] = val;
        v_b[k] = v;
        if (k == 0) continue;
        const double av = v < 0 ? -v : v;
        hfnz[quad[k]] += av;
        sum_vals += av;
        if (v != 0.0 && hfr[k]) sum_hf += av0;
        if (c == 1 && v == 0.0) {
          const double e = val - v < 0 ? -(val - v) : val - v;
          if (e > hfme[quad[k]]) hfme[quad[k]] = e;
        }
      }
      double quant = quant0;
      if (c == 1) {
        const bool allzero = sum_vals * 8 < 1.0;
        const bool bump =
            allzero && (((hfnz[1] == 0) && (hfme[1] > 0.46)) ||
                        ((hfnz[2] == 0) && (hfme[2] > 0.46)) ||
                        ((hfnz[3] == 0) && (hfme[3] > 0.46)));
        const double new_quant = quant + (bump ? 1.0 : 0.0);
        const double ratio = new_quant / quant;
        const bool cond3 = allzero && hfnz[3] == 0 && hfme[3] > 0.46;
        const bool cond12 =
            allzero && !cond3 && (((hfnz[1] == 0) && (hfme[1] > 0.46)) ||
                                  ((hfnz[2] == 0) && (hfme[2] > 0.46)));
        const bool cond0 = allzero && !cond3 && !cond12 &&
                           hfnz[0] == 0 && hfme[0] > 0.46;
        if (cond3) thr[3] = 0.9999 * hfme[3] * ratio;
        if (cond12) {
          const double t12 =
              0.9999 * (hfme[1] > hfme[2] ? hfme[1] : hfme[2]) * ratio;
          thr[1] = t12;
          thr[2] = t12;
        }
        if (cond0) thr[0] = 0.9999 * hfme[0] * ratio;
        quant = new_quant;
      }
      const double allnz = hfnz[0] + hfnz[1] + hfnz[2] + hfnz[3] + 1.0;
      const double boost = hf_mul[c] * sum_hf;
      if (boost >= allnz) {
        double q2 = quant + trunc(boost / allnz);
        const double cap = (double)(quant_max - 1);
        quant = q2 < cap ? q2 : cap;
      }
      if (hfnz[0] + hfnz[1] + hfnz[2] + hfnz[3] < 11.0) {
        const double cap = (double)(quant_max - 1);
        quant = quant + 1 < cap ? quant + 1 : cap;
      }
      double min_hf = hfnz[0];
      for (int q = 1; q < 4; q++)
        if (hfnz[q] < min_hf) min_hf = hfnz[q];
      const double activity = min_hf < 15.0 ? trunc(min_hf) : 15.0;
      if (c == 1)
        for (int q = 1; q < 4; q++) thr[q] += 0.01 * activity;
      double qp = quant - activity;
      double limit = trunc(quant / 2);
      if (limit < 4) limit = 4;
      if (qp < limit) qp = limit;
      if (qp > quant_final) quant_final = qp;
      (void)val_b;
      (void)v_b;
    }
    new_rq[n] = dct8_mask[n] ? (int32_t)quant_final : raw_quant[n];
    for (int q = 0; q < 4; q++) thr_y[n * 4 + q] = (float)thr[q];
  }
}

}  // extern "C"
