"""Modular predictors, properties and the self-correcting WP predictor.

Reference: lib/jxl/modular/encoding/context_predict.h. Semantics are
ported exactly (integer arithmetic, division-free WP weighting); the
per-pixel loop shape follows DecodeModularChannelMAANS's slow track.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from libjxl_tpu.modular.tree import (
    EXTRA_PROPS_PER_CHANNEL, NUM_NONREF_PROPERTIES, NUM_STATIC_PROPERTIES,
    WP_PROP,
)

# Predictor ids (modular/options.h:21-40)
P_ZERO = 0
P_LEFT = 1
P_TOP = 2
P_AVG0 = 3
P_SELECT = 4
P_GRADIENT = 5
P_WEIGHTED = 6
P_TOPRIGHT = 7
P_TOPLEFT = 8
P_LEFTLEFT = 9
P_AVG1 = 10
P_AVG2 = 11
P_AVG3 = 12
P_AVG4 = 13

_PRED_EXTRA_BITS = 3
_PRED_ROUND = ((1 << _PRED_EXTRA_BITS) >> 1) - 1  # 3

_DIVLOOKUP = np.array([(1 << 24) // (i + 1) for i in range(64)], np.int64)


def clamped_gradient(n: int, w: int, l: int) -> int:
    m = min(n, w)
    M = max(n, w)
    grad = n + w - l
    if l < m:
        return M
    if l > M:
        return m
    return grad


def select_predictor(a: int, b: int, c: int) -> int:
    p = a + b - c
    return a if abs(p - a) < abs(p - b) else b


@dataclasses.dataclass
class WPHeader:
    """weighted::Header (context_predict.h:33-68)."""
    all_default: bool = True
    p1c: int = 16
    p2c: int = 10
    p3ca: int = 7
    p3cb: int = 7
    p3cc: int = 7
    p3cd: int = 0
    p3ce: int = 0
    w0: int = 0xD
    w1: int = 0xC
    w2: int = 0xC
    w3: int = 0xC

    def visit_fields(self, v) -> None:
        if v.all_default(self):
            return
        self.p1c = v.bits(5, 16, self.p1c)
        self.p2c = v.bits(5, 10, self.p2c)
        self.p3ca = v.bits(5, 7, self.p3ca)
        self.p3cb = v.bits(5, 7, self.p3cb)
        self.p3cc = v.bits(5, 7, self.p3cc)
        self.p3cd = v.bits(5, 0, self.p3cd)
        self.p3ce = v.bits(5, 0, self.p3ce)
        self.w0 = v.bits(4, 0xD, self.w0)
        self.w1 = v.bits(4, 0xC, self.w1)
        self.w2 = v.bits(4, 0xC, self.w2)
        self.w3 = v.bits(4, 0xC, self.w3)


class WPState:
    """weighted::State (context_predict.h:70-215): 4 sub-predictors with
    error feedback, two rolling rows of per-predictor errors."""

    def __init__(self, header: WPHeader, xsize: int):
        self.h = header
        self.xsize = xsize
        stride = xsize + 2
        self.pred_errors = np.zeros((4, 2 * stride), np.int64)
        self.error = np.zeros(2 * stride, np.int64)
        self.prediction = [0, 0, 0, 0]
        self.pred = 0
        self.weights_hdr = [header.w0, header.w1, header.w2, header.w3]

    def _error_weight(self, x: int, maxweight: int) -> int:
        shift = max((x + 1).bit_length() - 1 - 5, 0)
        return 4 + ((maxweight * int(_DIVLOOKUP[x >> shift])) >> shift)

    def predict(self, x: int, y: int, n: int, w: int, ne: int, nw: int,
                nn: int) -> tuple[int, int]:
        """Returns (prediction, max_error_property)."""
        xsize = self.xsize
        stride = xsize + 2
        cur_row = 0 if (y & 1) else stride
        prev_row = stride if (y & 1) else 0
        pos_n = prev_row + x
        pos_ne = pos_n + 1 if x < xsize - 1 else pos_n
        pos_nw = pos_n - 1 if x > 0 else pos_n

        weights = []
        for i in range(4):
            wsum = int(self.pred_errors[i][pos_n]
                       + self.pred_errors[i][pos_ne]
                       + self.pred_errors[i][pos_nw])
            weights.append(self._error_weight(wsum, self.weights_hdr[i]))

        nb = n << _PRED_EXTRA_BITS
        wb = w << _PRED_EXTRA_BITS
        neb = ne << _PRED_EXTRA_BITS
        nwb = nw << _PRED_EXTRA_BITS
        nnb = nn << _PRED_EXTRA_BITS

        te_w = 0 if x == 0 else int(self.error[cur_row + x - 1])
        te_n = int(self.error[pos_n])
        te_nw = int(self.error[pos_nw])
        te_ne = int(self.error[pos_ne])
        sum_wn = te_n + te_w

        max_err = te_w
        for cand in (te_n, te_nw, te_ne):
            if abs(cand) > abs(max_err):
                max_err = cand

        h = self.h
        self.prediction[0] = wb + neb - nb
        self.prediction[1] = nb - (((sum_wn + te_ne) * h.p1c) >> 5)
        self.prediction[2] = wb - (((sum_wn + te_nw) * h.p2c) >> 5)
        self.prediction[3] = nb - ((te_nw * h.p3ca + te_n * h.p3cb
                                    + te_ne * h.p3cc + (nnb - nb) * h.p3cd
                                    + (nwb - wb) * h.p3ce) >> 5)

        # WeightedAverage (context_predict.h:110-131)
        weight_sum = sum(weights)
        log_weight = weight_sum.bit_length() - 1  # >= 4
        ws = [wi >> (log_weight - 4) for wi in weights]
        weight_sum = sum(ws)
        s = (weight_sum >> 1) - 1
        for i in range(4):
            s += self.prediction[i] * ws[i]
        pred = (s * int(_DIVLOOKUP[weight_sum - 1])) >> 24

        # clamp when neighbour errors disagree in sign
        if ((te_n ^ te_w) | (te_n ^ te_nw)) <= 0:
            mx = max(wb, neb, nb)
            mn = min(wb, neb, nb)
            pred = max(mn, min(mx, pred))
        self.pred = pred
        return (pred + _PRED_ROUND) >> _PRED_EXTRA_BITS, max_err

    def update_errors(self, val: int, x: int, y: int) -> None:
        xsize = self.xsize
        stride = xsize + 2
        cur_row = 0 if (y & 1) else stride
        prev_row = stride if (y & 1) else 0
        vb = val << _PRED_EXTRA_BITS
        self.error[cur_row + x] = self.pred - vb
        for i in range(4):
            err = (abs(self.prediction[i] - vb) + _PRED_ROUND) \
                >> _PRED_EXTRA_BITS
            self.pred_errors[i][cur_row + x] = err
            self.pred_errors[i][prev_row + x + 1] += err


def predict_one(p: int, left: int, top: int, toptop: int, topleft: int,
                topright: int, leftleft: int, toprightright: int,
                wp_pred: int) -> int:
    """context_predict.h:469-513 PredictOne."""
    if p == P_ZERO:
        return 0
    if p == P_LEFT:
        return left
    if p == P_TOP:
        return top
    if p == P_SELECT:
        return select_predictor(left, top, topleft)
    if p == P_WEIGHTED:
        return wp_pred
    if p == P_GRADIENT:
        return clamped_gradient(left, top, topleft)
    if p == P_TOPLEFT:
        return topleft
    if p == P_TOPRIGHT:
        return topright
    if p == P_LEFTLEFT:
        return leftleft
    # C++ integer division truncates toward ZERO (context_predict.h:497
    # `(left + top) / 2`); Python // floors — they differ by one on
    # negative odd sums (signed DC planes hit this constantly).
    if p == P_AVG0:
        return _tdiv(left + top, 2)
    if p == P_AVG1:
        return _tdiv(left + topleft, 2)
    if p == P_AVG2:
        return _tdiv(topleft + top, 2)
    if p == P_AVG3:
        return _tdiv(top + topright, 2)
    if p == P_AVG4:
        return _tdiv(6 * top - 2 * toptop + 7 * left + leftleft
                     + toprightright + 3 * topright + 8, 16)
    return 0


def _tdiv(a: int, b: int) -> int:
    """C-style integer division (truncation toward zero)."""
    q = abs(a) // b
    return -q if a < 0 else q


def neighbors(data: np.ndarray, x: int, y: int, w: int):
    """Edge-replicated neighbor fetch (context_predict.h:520-535)."""
    left = int(data[y, x - 1]) if x else (int(data[y - 1, x]) if y else 0)
    top = int(data[y - 1, x]) if y else left
    topleft = int(data[y - 1, x - 1]) if (x and y) else left
    topright = int(data[y - 1, x + 1]) if (x + 1 < w and y) else top
    leftleft = int(data[y, x - 2]) if x > 1 else left
    toptop = int(data[y - 2, x]) if y > 1 else top
    toprightright = int(data[y - 1, x + 2]) if (x + 2 < w and y) else topright
    return left, top, topleft, topright, leftleft, toptop, toprightright


def precompute_references(image, chan_idx: int, y: int,
                          num_extra_props: int) -> np.ndarray:
    """context_predict.h:410-443: 4 props per earlier same-shape channel."""
    ch = image.channel[chan_idx]
    out = np.zeros((num_extra_props, ch.w), np.int64)
    offset = 0
    for j in range(chan_idx - 1, -1, -1):
        if offset >= num_extra_props:
            break
        cj = image.channel[j]
        if (cj.w != ch.w or cj.h != ch.h or cj.hshift != ch.hshift
                or cj.vshift != ch.vshift):
            continue
        row = cj.data[y].astype(np.int64)
        prev = cj.data[y - 1].astype(np.int64) if y else None
        vleft = np.concatenate([[0], row[:-1]])
        if y:
            vtop = prev
            vtopleft = np.concatenate([[vleft[0]], prev[:-1]])
        else:
            vtop = vleft
            vtopleft = vleft
        mn = np.minimum(vtop, vleft)
        mx = np.maximum(vtop, vleft)
        grad = vtop + vleft - vtopleft
        vpred = np.where(vtopleft < mn, mx, np.where(vtopleft > mx, mn, grad))
        out[offset] = np.abs(row)
        out[offset + 1] = row
        out[offset + 2] = np.abs(row - vpred)
        out[offset + 3] = row - vpred
        offset += EXTRA_PROPS_PER_CHANNEL
    return out
