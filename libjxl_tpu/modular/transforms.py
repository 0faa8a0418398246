"""Modular transforms: RCT, Palette, Squeeze (forward + inverse + meta).

Reference: lib/jxl/modular/transform/{rct,palette,squeeze,enc_*}.cc and
palette.h (implicit delta/cube palettes). Inverses are numpy-vectorized
per row/plane; the Squeeze inverse also exists as a batched JAX op for
the TPU decode path (ops/squeeze.py).
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.modular.image import Channel, ModularImage
from libjxl_tpu.modular.predict import (
    P_WEIGHTED, P_ZERO, WPHeader, WPState, neighbors, predict_one,
)

# ---------------------------------------------------------------------------
# RCT (rct.cc): 42 types = 6 permutations x 7 custom types (6=YCoCg)


def _native_ok() -> bool:
    import os
    if os.environ.get("LIBJXL_TPU_NO_NATIVE"):
        return False
    from libjxl_tpu.native import bindings
    return bindings.available()


def _perm_indices(permutation: int) -> list[int]:
    """Output channel index for each of the three inputs (rct.cc:119-126)."""
    return [permutation % 3,
            (permutation + 1 + permutation // 3) % 3,
            (permutation + 2 - permutation // 3) % 3]


def inv_rct(image: ModularImage, begin_c: int, rct_type: int) -> None:
    if rct_type == 0:
        return
    permutation = rct_type // 7
    custom = rct_type % 7
    planes = [image.channel[begin_c + k].data for k in range(3)]
    if (_native_ok() and
            all(p.dtype == np.int32 and p.flags.c_contiguous
                and p.shape == planes[0].shape for p in planes)):
        from libjxl_tpu.native import bindings
        bindings.rct3(planes[0], planes[1], planes[2], custom,
                      forward=False)
        idx = _perm_indices(permutation)
        for i in range(3):
            image.channel[begin_c + idx[i]].data = planes[i]
        return
    c0, c1, c2 = (p.astype(np.int64) for p in planes)
    if custom == 6:  # YCoCg
        y, co, cg = c0, c1, c2
        tmp = y - (cg >> 1)
        g = cg + tmp
        b = tmp - (co >> 1)
        r = b + co
        out = [r, g, b]
    else:
        second = custom >> 1
        third = custom & 1
        first, snd, thd = c0, c1, c2
        if third:
            thd = thd + first
        if second == 1:
            snd = snd + first
        elif second == 2:
            snd = snd + ((first + thd) >> 1)
        out = [first, snd, thd]
    idx = _perm_indices(permutation)
    for i, o in enumerate(out):
        image.channel[begin_c + idx[i]].data = o.astype(np.int32)


def fwd_rct(image: ModularImage, begin_c: int, rct_type: int) -> None:
    """enc_rct.cc: inverse of inv_rct."""
    if rct_type == 0:
        return
    permutation = rct_type // 7
    custom = rct_type % 7
    idx = _perm_indices(permutation)
    if rct_type == 6:
        # YCoCg fast path: int32 in place (values stay within int32 for
        # <= 16-bit samples + the two carry bits).
        r = image.channel[begin_c + idx[0]].data.astype(np.int32,
                                                        copy=False)
        g = image.channel[begin_c + idx[1]].data.astype(np.int32,
                                                        copy=False)
        b = image.channel[begin_c + idx[2]].data.astype(np.int32,
                                                        copy=False)
        if (_native_ok() and r.flags.c_contiguous and g.flags.c_contiguous
                and b.flags.c_contiguous and r.shape == g.shape == b.shape):
            from libjxl_tpu.native import bindings
            r, g, b = (np.copy(p) for p in (r, g, b))
            bindings.rct3(r, g, b, 6, forward=True)
            image.channel[begin_c].data = r
            image.channel[begin_c + 1].data = g
            image.channel[begin_c + 2].data = b
            return
        co = r - b
        tmp = b + (co >> 1)
        cg = g - tmp
        y = tmp + (cg >> 1)
        image.channel[begin_c].data = y
        image.channel[begin_c + 1].data = co
        image.channel[begin_c + 2].data = cg
        return
    chans = [image.channel[begin_c + idx[i]].data.astype(np.int64)
             for i in range(3)]
    if custom == 6:
        r, g, b = chans
        co = r - b
        tmp = b + (co >> 1)
        cg = g - tmp
        y = tmp + (cg >> 1)
        out = [y, co, cg]
    else:
        second = custom >> 1
        third = custom & 1
        first, snd, thd = chans
        if second == 1:
            snd = snd - first
        elif second == 2:
            snd = snd - ((first + thd) >> 1)
        if third:
            thd = thd - first
        out = [first, snd, thd]
    for i, o in enumerate(out):
        image.channel[begin_c + i].data = o.astype(np.int32)


# ---------------------------------------------------------------------------
# Palette (palette.h / palette.cc)

_SMALL_CUBE = 4
_SMALL_CUBE_BITS = 2
_LARGE_CUBE = 5
_LARGE_CUBE_OFFSET = _SMALL_CUBE ** 3

_DELTA_PALETTE = np.array([
    [0, 0, 0], [4, 4, 4], [11, 0, 0], [0, 0, -13], [0, -12, 0],
    [-10, -10, -10], [-18, -18, -18], [-27, -27, -27], [-18, -18, 0],
    [0, 0, -32], [-32, 0, 0], [-37, -37, -37], [0, -32, -32], [24, 24, 45],
    [50, 50, 50], [-45, -24, -24], [-24, -45, -45], [0, -24, -24],
    [-34, -34, 0], [-24, 0, -24], [-45, -45, -24], [64, 64, 64],
    [-32, 0, -32], [0, -32, 0], [-32, 0, 32], [-24, -45, -24], [45, 24, 45],
    [24, -24, -45], [-45, -24, 24], [80, 80, 80], [64, 0, 0], [0, 0, -64],
    [0, -64, -64], [-24, -24, 45], [96, 96, 96], [64, 64, 0], [45, -24, -24],
    [34, -34, 0], [112, 112, 112], [24, -45, -45], [45, 45, -24],
    [0, -32, 32], [24, -24, 45], [0, 96, 96], [45, -24, 24], [24, -45, -24],
    [-24, -45, 24], [0, -64, 0], [96, 0, 0], [128, 128, 128], [64, 0, 64],
    [144, 144, 144], [96, 96, 0], [-36, -36, 36], [45, -24, -45],
    [45, -45, -24], [0, 0, -96], [0, 128, 128], [0, 96, 0], [45, 24, -45],
    [-128, 0, 0], [24, -45, 24], [-45, 24, -45], [64, 0, -64], [64, -64, -64],
    [96, 0, 96], [45, -45, 24], [24, 45, -45], [64, 64, -64], [128, 128, 0],
    [0, 0, -128], [-24, 45, -45]], np.int64)


def get_palette_value(palette: np.ndarray, index: int, c: int,
                      palette_size: int, bit_depth: int) -> int:
    """palette.h:54-125 GetPaletteValue (implicit entries included)."""
    if index < 0:
        if c >= 3:
            return 0
        index = -(index + 1)
        index %= 1 + 2 * (len(_DELTA_PALETTE) - 1)
        result = int(_DELTA_PALETTE[(index + 1) >> 1][c])
        if index & 1:
            pass
        else:
            result = -result
        # kMultiplier = {-1, 1}[index & 1]
        if bit_depth > 8:
            result *= 1 << (bit_depth - 8)
        return result
    if palette_size <= index < palette_size + _LARGE_CUBE_OFFSET:
        if c >= 3:
            return 0
        index -= palette_size
        index >>= c * _SMALL_CUBE_BITS
        return ((index % _SMALL_CUBE) * ((1 << bit_depth) - 1) >> 2) \
            + (1 << max(0, bit_depth - 3))
    if index >= palette_size + _LARGE_CUBE_OFFSET:
        if c >= 3:
            return 0
        index -= palette_size + _LARGE_CUBE_OFFSET
        if c == 1:
            index //= _LARGE_CUBE
        elif c == 2:
            index //= _LARGE_CUBE * _LARGE_CUBE
        return (index % _LARGE_CUBE) * ((1 << bit_depth) - 1) >> 2
    return int(palette[c, index])


def meta_palette(image: ModularImage, begin_c: int, end_c: int,
                 nb_colors: int, nb_deltas: int) -> None:
    """palette.cc:177-200 MetaPalette."""
    nb = end_c - begin_c + 1
    if begin_c >= image.nb_meta_channels:
        image.nb_meta_channels += 1
    else:
        if end_c >= image.nb_meta_channels:
            raise BitstreamError("palette mixes meta and non-meta")
        image.nb_meta_channels += 2 - nb
    del image.channel[begin_c + 1:end_c + 1]
    pch = Channel.create(nb_colors + nb_deltas, nb, hshift=-1, vshift=-1)
    image.channel.insert(0, pch)


def inv_palette(image: ModularImage, begin_c: int, nb_colors: int,
                nb_deltas: int, predictor: int, wp_header: WPHeader) -> None:
    """palette.cc:28-175 InvPalette."""
    if image.nb_meta_channels < 1:
        raise BitstreamError("palette transform without palette")
    nb = image.channel[0].h
    c0 = begin_c + 1
    if c0 >= len(image.channel):
        raise BitstreamError("palette channel out of range")
    w = image.channel[c0].w
    h = image.channel[c0].h
    if nb < 1:
        raise BitstreamError("corrupted palette transform")
    for i in range(1, nb):
        ch = Channel.create(w, h, image.channel[c0].hshift,
                            image.channel[c0].vshift)
        image.channel.insert(c0 + 1, ch)
    palette = image.channel[0].data.astype(np.int64)  # (nb, colors)
    palette_size = image.channel[0].w
    bit_depth = min(image.bitdepth, 24)

    if w == 0:
        pass
    elif nb_deltas == 0 and predictor == P_ZERO:
        # Vectorized: build a lookup covering all possible index values.
        indices = image.channel[c0].data.astype(np.int64)
        lo = int(indices.min()) if indices.size else 0
        hi = int(indices.max()) if indices.size else 0
        lo = min(lo, 0)
        hi = max(hi, 0)
        if nb == 1:
            indices = np.clip(indices, 0, palette_size - 1)
            lo, hi = 0, palette_size - 1
        lut_size = hi - lo + 1
        for c in range(nb):
            lut = np.array([get_palette_value(palette, i, c, palette_size,
                                              bit_depth)
                            for i in range(lo, hi + 1)], np.int64)
            image.channel[c0 + c].data = \
                lut[(np.clip(indices, lo, hi) - lo)].astype(np.int32)
    else:
        indices = image.channel[c0].data.copy()
        for c in range(nb):
            chan = image.channel[c0 + c]
            data = np.zeros((h, w), np.int32)
            wp_state = WPState(wp_header, w) if predictor == P_WEIGHTED \
                else None
            for y in range(h):
                for x in range(w):
                    index = int(indices[y, x])
                    entry = get_palette_value(palette, index, c,
                                              palette_size, bit_depth)
                    if wp_state is not None:
                        left, top, topleft, topright, leftleft, toptop, trr \
                            = neighbors(data, x, y, w)
                        guess, _ = wp_state.predict(
                            x, y, top, left, topright, topleft, toptop)
                        if index < nb_deltas:
                            val = guess + entry
                        else:
                            val = entry
                        data[y, x] = val
                        wp_state.update_errors(int(data[y, x]), x, y)
                    else:
                        if index < nb_deltas:
                            left, top, topleft, topright, leftleft, toptop, \
                                trr = neighbors(data, x, y, w)
                            guess = predict_one(predictor, left, top, toptop,
                                                topleft, topright, leftleft,
                                                trr, 0)
                            val = guess + entry
                        else:
                            val = entry
                        data[y, x] = val
            chan.data = data
    if c0 >= image.nb_meta_channels:
        image.nb_meta_channels -= 1
    else:
        image.nb_meta_channels -= 2 - nb
    del image.channel[0]


# ---------------------------------------------------------------------------
# Squeeze (squeeze.cc / enc_squeeze.cc)

MAX_FIRST_PREVIEW_SIZE = 8


def smooth_tendency(b: int, a: int, n: int) -> int:
    """squeeze.h:60-77 (int math; C division truncates toward zero)."""
    diff = 0
    if b >= a >= n:
        diff = (4 * b - 3 * n - a + 6) // 12
        if diff - (diff & 1) > 2 * (b - a):
            diff = 2 * (b - a) + 1
        if diff + (diff & 1) > 2 * (a - n):
            diff = 2 * (a - n)
    elif b <= a <= n:
        diff = -((-(4 * b - 3 * n - a - 6)) // 12)  # trunc toward zero
        if diff + (diff & 1) < 2 * (b - a):
            diff = 2 * (b - a) - 1
        if diff - (diff & 1) < 2 * (a - n):
            diff = 2 * (a - n)
    return diff


def _smooth_tendency_vec(b, a, n):
    """Vectorized smooth_tendency over int64 arrays."""
    d1 = 4 * b - 3 * n - a + 6
    diff_pos = np.sign(d1) * (np.abs(d1) // 12) \
        if False else d1 // 12  # d1 >= 0 in pos branch
    # positive monotonic branch
    diff_pos = (4 * b - 3 * n - a + 6) // 12
    cond = diff_pos - (diff_pos & 1) > 2 * (b - a)
    diff_pos = np.where(cond, 2 * (b - a) + 1, diff_pos)
    cond = diff_pos + (diff_pos & 1) > 2 * (a - n)
    diff_pos = np.where(cond, 2 * (a - n), diff_pos)
    # negative monotonic branch (trunc toward zero)
    num = 4 * b - 3 * n - a - 6
    diff_neg = -((-num) // 12)
    cond = diff_neg + (diff_neg & 1) < 2 * (b - a)
    diff_neg = np.where(cond, 2 * (b - a) - 1, diff_neg)
    cond = diff_neg - (diff_neg & 1) < 2 * (a - n)
    diff_neg = np.where(cond, 2 * (a - n), diff_neg)
    pos = (b >= a) & (a >= n)
    neg = (b <= a) & (a <= n)
    return np.where(pos, diff_pos, np.where(neg, diff_neg, 0))


def _trunc_div2(v):
    """C-style v / 2 (truncation toward zero) for arrays/ints."""
    return np.where(v >= 0, v >> 1, -((-v) >> 1))


def inv_h_squeeze(image: ModularImage, c: int, rc: int) -> None:
    chin = image.channel[c]
    chres = image.channel[rc]
    if chres.w == 0:
        image.channel[c].hshift -= 1
        return
    w_out = chin.w + chres.w
    out = np.zeros((chin.h, w_out), np.int64)
    if chres.h != 0:
        avg = chin.data.astype(np.int64)
        res = chres.data.astype(np.int64)
        # Sequential in x (left output feeds tendency); loop over x,
        # vectorized over rows.
        prev_odd = None
        for x in range(chres.w):
            a = avg[:, x]
            next_avg = avg[:, x + 1] if x + 1 < chin.w else a
            left = out[:, 2 * x - 1] if x else a
            tendency = _smooth_tendency_vec(left, a, next_avg)
            diff = res[:, x] + tendency
            A = a + _trunc_div2(diff)
            out[:, 2 * x] = A
            out[:, 2 * x + 1] = A - diff
        if w_out & 1:
            out[:, w_out - 1] = avg[:, chin.w - 1]
    image.channel[c] = Channel(out.astype(np.int32), chin.hshift - 1,
                               chin.vshift)


def inv_v_squeeze(image: ModularImage, c: int, rc: int) -> None:
    chin = image.channel[c]
    chres = image.channel[rc]
    if chres.h == 0:
        image.channel[c].vshift -= 1
        return
    h_out = chin.h + chres.h
    out = np.zeros((h_out, chin.w), np.int64)
    if chres.w != 0:
        avg = chin.data.astype(np.int64)
        res = chres.data.astype(np.int64)
        for y in range(chres.h):
            a = avg[y]
            next_avg = avg[y + 1] if y + 1 < chin.h else a
            top = out[2 * y - 1] if y else a
            tendency = _smooth_tendency_vec(top, a, next_avg)
            diff = res[y] + tendency
            A = a + _trunc_div2(diff)
            out[2 * y] = A
            out[2 * y + 1] = A - diff
        if h_out & 1:
            out[h_out - 1] = avg[chin.h - 1]
    image.channel[c] = Channel(out.astype(np.int32), chin.hshift,
                               chin.vshift - 1)


def default_squeeze_parameters(image: ModularImage) -> list:
    """squeeze.cc:387-443."""
    from libjxl_tpu.modular.codec import SqueezeParams

    params = []
    nb_channels = len(image.channel) - image.nb_meta_channels
    w = image.channel[image.nb_meta_channels].w
    h = image.channel[image.nb_meta_channels].h
    wide = w > h
    if nb_channels > 2 and \
            image.channel[image.nb_meta_channels + 1].w == w and \
            image.channel[image.nb_meta_channels + 1].h == h:
        params.append(SqueezeParams(True, False,
                                    image.nb_meta_channels + 1, 2))
        params.append(SqueezeParams(False, False,
                                    image.nb_meta_channels + 1, 2))
    base = SqueezeParams(False, True, image.nb_meta_channels, nb_channels)
    if not wide and h > MAX_FIRST_PREVIEW_SIZE:
        params.append(SqueezeParams(False, True, base.begin_c, base.num_c))
        h = (h + 1) // 2
    while w > MAX_FIRST_PREVIEW_SIZE or h > MAX_FIRST_PREVIEW_SIZE:
        if w > MAX_FIRST_PREVIEW_SIZE:
            params.append(SqueezeParams(True, True, base.begin_c, base.num_c))
            w = (w + 1) // 2
        if h > MAX_FIRST_PREVIEW_SIZE:
            params.append(SqueezeParams(False, True, base.begin_c, base.num_c))
            h = (h + 1) // 2
    return params


def meta_squeeze(image: ModularImage, squeezes: list) -> None:
    """squeeze.cc:456-516 MetaSqueeze (geometry-only apply)."""
    if not squeezes:
        squeezes.extend(default_squeeze_parameters(image))
    for p in squeezes:
        if p.begin_c + p.num_c > len(image.channel):
            raise BitstreamError("invalid squeeze channel range")
        beginc, endc = p.begin_c, p.begin_c + p.num_c - 1
        if beginc < image.nb_meta_channels:
            if endc >= image.nb_meta_channels:
                raise BitstreamError("squeeze mixes meta/non-meta")
            if not p.in_place:
                raise BitstreamError("meta squeeze must be in place")
            image.nb_meta_channels += p.num_c
        offset = endc + 1 if p.in_place else len(image.channel)
        for c in range(beginc, endc + 1):
            ch = image.channel[c]
            if ch.hshift > 30 or ch.vshift > 30:
                raise BitstreamError("too many squeezes")
            w, h = ch.w, ch.h
            if w == 0 or h == 0:
                raise BitstreamError("squeezing empty channel")
            if p.horizontal:
                new_w = (w + 1) // 2
                ch.data = np.zeros((h, new_w), np.int32)
                if ch.hshift >= 0:
                    ch.hshift += 1
                res_w, res_h = w - new_w, h
            else:
                new_h = (h + 1) // 2
                ch.data = np.zeros((new_h, w), np.int32)
                if ch.vshift >= 0:
                    ch.vshift += 1
                res_w, res_h = w, h - new_h
            placeholder = Channel.create(res_w, res_h, ch.hshift, ch.vshift)
            image.channel.insert(offset + (c - beginc), placeholder)


def inv_squeeze(image: ModularImage, squeezes: list) -> None:
    """squeeze.cc:331-371 InvSqueeze."""
    for p in reversed(squeezes):
        beginc, endc = p.begin_c, p.begin_c + p.num_c - 1
        offset = endc + 1 if p.in_place \
            else len(image.channel) + beginc - endc - 1
        if beginc < image.nb_meta_channels:
            image.nb_meta_channels -= p.num_c
        for c in range(beginc, endc + 1):
            rc = offset + c - beginc
            if rc >= len(image.channel):
                raise BitstreamError("invalid squeeze residual index")
            if (image.channel[c].w < image.channel[rc].w
                    or image.channel[c].h < image.channel[rc].h):
                raise BitstreamError("corrupted squeeze")
            if p.horizontal:
                inv_h_squeeze(image, c, rc)
            else:
                inv_v_squeeze(image, c, rc)
        del image.channel[offset:offset + (endc - beginc + 1)]


def _average(a, b):
    """enc_squeeze.cc AVERAGE: (a + b + (a > b)) >> 1."""
    return (a + b + (a > b).astype(np.int64)) >> 1


def fwd_h_squeeze(image: ModularImage, c: int, rc: int) -> None:
    chin = image.channel[c]
    _comp = chin.component
    data = chin.data.astype(np.int64)
    w_half = (chin.w + 1) // 2
    res_w = chin.w - w_half
    out = np.zeros((chin.h, w_half), np.int64)
    res = np.zeros((chin.h, res_w), np.int64)
    A = data[:, 0:2 * res_w:2]
    B = data[:, 1:2 * res_w:2]
    avg = _average(A, B)
    out[:, :res_w] = avg
    if chin.w & 1:
        out[:, w_half - 1] = data[:, chin.w - 1]
    diff = A - B
    for x in range(res_w):
        if x + 1 < res_w:
            next_avg = avg[:, x + 1]
        elif chin.w & 1:
            next_avg = data[:, 2 * x + 2]
        else:
            next_avg = avg[:, x]
        left = data[:, 2 * x - 1] if x > 0 else avg[:, x]
        tendency = _smooth_tendency_vec(left, avg[:, x], next_avg)
        res[:, x] = diff[:, x] - tendency
    image.channel[c] = Channel(out.astype(np.int32), chin.hshift + 1,
                               chin.vshift, component=_comp)
    image.channel.insert(rc, Channel(res.astype(np.int32), chin.hshift + 1,
                                     chin.vshift, component=_comp))


def fwd_v_squeeze(image: ModularImage, c: int, rc: int) -> None:
    chin = image.channel[c]
    _comp = chin.component
    data = chin.data.astype(np.int64)
    h_half = (chin.h + 1) // 2
    res_h = chin.h - h_half
    out = np.zeros((h_half, chin.w), np.int64)
    res = np.zeros((res_h, chin.w), np.int64)
    A = data[0:2 * res_h:2]
    B = data[1:2 * res_h:2]
    avg = _average(A, B)
    out[:res_h] = avg
    if chin.h & 1:
        out[h_half - 1] = data[chin.h - 1]
    diff = A - B
    for y in range(res_h):
        if y + 1 < res_h:
            next_avg = avg[y + 1]
        elif chin.h & 1:
            next_avg = data[2 * y + 2]
        else:
            next_avg = avg[y]
        top = data[2 * y - 1] if y > 0 else avg[y]
        tendency = _smooth_tendency_vec(top, avg[y], next_avg)
        res[y] = diff[y] - tendency
    image.channel[c] = Channel(out.astype(np.int32), chin.hshift,
                               chin.vshift + 1, component=_comp)
    image.channel.insert(rc, Channel(res.astype(np.int32), chin.hshift,
                                     chin.vshift + 1, component=_comp))


def fwd_squeeze(image: ModularImage, squeezes: list) -> None:
    """enc_squeeze.cc FwdSqueeze: apply in order."""
    if not squeezes:
        squeezes.extend(default_squeeze_parameters(image))
    for p in squeezes:
        beginc, endc = p.begin_c, p.begin_c + p.num_c - 1
        if beginc < image.nb_meta_channels:
            image.nb_meta_channels += p.num_c
        offset = endc + 1 if p.in_place else len(image.channel)
        for c in range(beginc, endc + 1):
            rc = offset + c - beginc
            if p.horizontal:
                fwd_h_squeeze(image, c, rc)
            else:
                fwd_v_squeeze(image, c, rc)


def fwd_palette(image: ModularImage, begin_c: int, num_c: int,
                ) -> tuple[int, int]:
    """enc_palette.cc FwdPalette (exact colors, no deltas): replaces
    channels [begin_c, begin_c+num_c) with one index channel plus a
    meta palette channel. Returns (nb_colors, nb_deltas)."""
    chans = [image.channel[begin_c + i].data for i in range(num_c)]
    stacked = np.stack([c.ravel() for c in chans], axis=1)  # (N, num_c)
    colors, inverse = np.unique(stacked, axis=0, return_inverse=True)
    nb_colors = colors.shape[0]
    h, w = chans[0].shape
    idx = inverse.reshape(h, w).astype(np.int32)
    end_c = begin_c + num_c - 1
    if begin_c >= image.nb_meta_channels:
        image.nb_meta_channels += 1
    else:
        image.nb_meta_channels += 2 - num_c
    del image.channel[begin_c + 1:end_c + 1]
    image.channel[begin_c] = Channel(idx, 0, 0)
    pch = Channel(colors.T.astype(np.int32).copy(), -1, -1)
    image.channel.insert(0, pch)
    return nb_colors, 0
