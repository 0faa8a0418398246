"""Dequantization matrices: computation from parameters + defaults.

Reference: lib/jxl/quant_weights.{h,cc} — ComputeQuantTable
(GetQuantWeights distance-band interpolation, DCT2/ID/DCT4/DCT4X8/AFV
special modes), the default parameter library (quant_weights_data.py),
DC quants (kInvDCQuant), and bitstream (de)serialization of
QuantEncoding.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import read_f16, write_f16
from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct import quant_weights_data as data

ALMOST_ZERO = 1e-8

# Quant encoding modes (quant_weights.h)
MODE_LIBRARY = 0
MODE_ID = 1
MODE_DCT2 = 2
MODE_DCT4 = 3
MODE_DCT4X8 = 4
MODE_AFV = 5
MODE_DCT = 6
MODE_RAW = 7

INV_DC_QUANT = np.array([4096.0, 512.0, 256.0], np.float32)
DC_QUANT = 1.0 / INV_DC_QUANT

# AFV kFreqs (quant_weights.cc:247-263)
_AFV_FREQS = [0.0, 0.0, 0.8517778890324296, 5.37778436506804,
              0.0, 0.0, 4.734747904497923, 5.449245381693219,
              1.6598270267479331, 4.0, 7.275749096817861, 10.423227632456525,
              2.662932286148962, 7.630657783650829, 8.962388608184032,
              12.97166202570235]


def _mult(v: float) -> float:
    return 1.0 + v if v > 0 else 1.0 / (1.0 - v)


def _interpolate(pos: float, maxval: float, array: np.ndarray) -> float:
    scaled_pos = pos * (len(array) - 1) / maxval
    idx = int(scaled_pos)
    idx = min(idx, len(array) - 2)
    a, b = array[idx], array[idx + 1]
    return a * (b / a) ** (scaled_pos - idx)


def _get_quant_weights(rows: int, cols: int, distance_bands: list,
                       ) -> np.ndarray:
    """GetQuantWeights (quant_weights.cc:130-160): per channel (3, rows, cols)."""
    out = np.zeros((3, rows, cols), np.float64)
    for c in range(3):
        db = distance_bands[c]
        num_bands = len(db)
        bands = [db[0]]
        if bands[0] < ALMOST_ZERO:
            raise BitstreamError("invalid distance bands")
        for i in range(1, num_bands):
            bands.append(bands[-1] * _mult(db[i]))
            if bands[-1] < ALMOST_ZERO:
                raise BitstreamError("invalid distance bands")
        bands = np.array(bands)
        scale = (num_bands - 1) / (np.sqrt(2) + 1e-6)
        rcpcol = scale / (cols - 1)
        rcprow = scale / (rows - 1)
        dy = np.arange(rows)[:, None] * rcprow
        dx = np.arange(cols)[None, :] * rcpcol
        dist = np.sqrt(dx * dx + dy * dy)
        if num_bands == 1:
            out[c] = bands[0]
        else:
            scaled_pos = dist  # already scaled to band index units
            idx = np.minimum(scaled_pos.astype(np.int32), num_bands - 2)
            frac = scaled_pos - idx
            a = bands[idx]
            b = bands[idx + 1]
            out[c] = a * (b / a) ** frac
    return out


@dataclasses.dataclass
class QuantEncoding:
    """One quant table's parameters (QuantEncoding in quant_weights.h)."""
    mode: int = MODE_LIBRARY
    predefined: int = 0
    # DCT mode
    dct_params: list | None = None      # 3 x num_bands
    # ID / DCT2 weights
    idweights: list | None = None       # 3 x 3
    dct2weights: list | None = None     # 3 x 6
    # DCT4 / DCT4X8
    dct4multipliers: list | None = None  # 3 x 2
    dct4x8multipliers: list | None = None  # 3
    # AFV
    afv_weights: list | None = None     # 3 x 9
    dct_params_afv_4x4: list | None = None
    # RAW
    qraw_table: np.ndarray | None = None  # int (3, rows*cols)
    qraw_den: float = 1.0


def _default_encoding(table_idx: int) -> QuantEncoding:
    """The library defaults (quant_weights.cc:1114-1178)."""
    d = data
    if table_idx == 0:
        return QuantEncoding(MODE_DCT, dct_params=d.DCT8_PARAMS["bands"])
    if table_idx == 1:
        return QuantEncoding(MODE_ID, idweights=d.IDENTITY_WEIGHTS)
    if table_idx == 2:
        return QuantEncoding(MODE_DCT2, dct2weights=d.DCT2X2_WEIGHTS)
    if table_idx == 3:
        return QuantEncoding(MODE_DCT4, dct_params=d.DCT4X4_PARAMS["bands"],
                             dct4multipliers=d.DCT4X4_PARAMS["muls"])
    if table_idx == 4:
        return QuantEncoding(MODE_DCT, dct_params=d.DCT16X16_PARAMS["bands"])
    if table_idx == 5:
        return QuantEncoding(MODE_DCT, dct_params=d.DCT32X32_PARAMS["bands"])
    if table_idx == 6:
        return QuantEncoding(MODE_DCT, dct_params=d.DCT8X16_PARAMS["bands"])
    if table_idx == 7:
        return QuantEncoding(MODE_DCT, dct_params=d.DCT8X32_PARAMS["bands"])
    if table_idx == 8:
        return QuantEncoding(MODE_DCT, dct_params=d.DCT16X32_PARAMS["bands"])
    if table_idx == 9:
        return QuantEncoding(MODE_DCT4X8, dct_params=d.DCT4X8_PARAMS["bands"],
                             dct4x8multipliers=d.DCT4X8_PARAMS["muls"])
    if table_idx == 10:
        return QuantEncoding(MODE_AFV, dct_params=d.DCT4X8_PARAMS["bands"],
                             dct_params_afv_4x4=d.DCT4X4_PARAMS["bands"],
                             afv_weights=d.AFV_WEIGHTS)
    names = ["DCT64X64", "DCT32X64", "DCT128X128", "DCT64X128",
             "DCT256X256", "DCT128X256"]
    params = getattr(d, names[table_idx - 11] + "_PARAMS")
    return QuantEncoding(MODE_DCT, dct_params=params["bands"])


def compute_quant_table(encoding: QuantEncoding, table_idx: int) -> np.ndarray:
    """ComputeQuantTable (quant_weights.cc:163-339): returns the
    (3, rows*8, cols*8) DEQUANT weight matrix (1/weights is the
    inverse table)."""
    if encoding.mode == MODE_LIBRARY:
        encoding = _default_encoding(table_idx)
    wrows = 8 * acs.QUANT_TABLE_SIZE_X[table_idx]
    wcols = 8 * acs.QUANT_TABLE_SIZE_Y[table_idx]
    # NOTE reference naming: required_size_x rows, _y cols (see
    # quant_weights.cc:170-171); for rectangular tables x<y so the
    # stored table has the wider side on cols, matching
    # coefficient_layout.
    weights = np.zeros((3, wrows, wcols), np.float64)

    if encoding.mode == MODE_ID:
        for c in range(3):
            weights[c] = encoding.idweights[c][0]
            weights[c, 0, 1] = encoding.idweights[c][1]
            weights[c, 1, 0] = encoding.idweights[c][1]
            weights[c, 1, 1] = encoding.idweights[c][2]
    elif encoding.mode == MODE_DCT2:
        for c in range(3):
            w = encoding.dct2weights[c]
            m = np.zeros((8, 8), np.float64)
            m[0, 0] = 0xBAD  # 2989.0 marker; never used (DC slot)
            m[0, 1] = m[1, 0] = w[0]
            m[1, 1] = w[1]
            m[:2, 2:4] = w[2]
            m[2:4, :2] = w[2]
            m[2:4, 2:4] = w[3]
            m[:4, 4:8] = w[4]
            m[4:8, :4] = w[4]
            m[4:8, 4:8] = w[5]
            weights[c] = m
    elif encoding.mode == MODE_DCT4:
        w44 = _get_quant_weights(4, 4, encoding.dct_params)
        for c in range(3):
            weights[c] = np.kron(w44[c], np.ones((2, 2)))
            weights[c, 0, 1] /= encoding.dct4multipliers[c][0]
            weights[c, 1, 0] /= encoding.dct4multipliers[c][0]
            weights[c, 1, 1] /= encoding.dct4multipliers[c][1]
    elif encoding.mode == MODE_DCT4X8:
        w48 = _get_quant_weights(4, 8, encoding.dct_params)
        for c in range(3):
            weights[c] = np.repeat(w48[c], 2, axis=0)
            weights[c, 1, 0] /= encoding.dct4x8multipliers[c]
    elif encoding.mode == MODE_AFV:
        w48 = _get_quant_weights(4, 8, encoding.dct_params)
        w44 = _get_quant_weights(4, 4, encoding.dct_params_afv_4x4)
        lo = 0.8517778890324296
        hi = 12.97166202570235 - lo + 1e-6
        for c in range(3):
            afv = encoding.afv_weights[c]
            bands = [afv[5]]
            if bands[0] < ALMOST_ZERO:
                raise BitstreamError("invalid AFV bands")
            for i in range(1, 4):
                bands.append(bands[-1] * _mult(afv[i + 5]))
                if bands[-1] < ALMOST_ZERO:
                    raise BitstreamError("invalid AFV bands")
            bands = np.array(bands)
            m = weights[c]
            m[0, 0] = 1.0  # unused
            m[1, 0] = afv[0]
            m[0, 1] = afv[1]
            m[2, 0] = afv[2]
            m[0, 2] = afv[3]
            m[2, 2] = afv[4]
            for y in range(4):
                for x in range(4):
                    if x < 2 and y < 2:
                        continue
                    val = _interpolate(_AFV_FREQS[y * 4 + x] - lo, hi, bands)
                    m[2 * y, 2 * x] = val
            # 4x8 weights in odd rows (except (0,1) position -> (1,0)).
            for y in range(4):
                for x in range(8):
                    if x == 0 and y == 0:
                        continue
                    m[2 * y + 1, x] = w48[c, y, x]
            # 4x4 weights in even rows / odd columns.
            for y in range(4):
                for x in range(4):
                    if x == 0 and y == 0:
                        continue
                    m[2 * y, 2 * x + 1] = w44[c, y, x]
    elif encoding.mode == MODE_DCT:
        weights = _get_quant_weights(wrows, wcols, encoding.dct_params)
    elif encoding.mode == MODE_RAW:
        if encoding.qraw_table is None or \
                encoding.qraw_table.size != 3 * wrows * wcols:
            raise BitstreamError("invalid raw quant table")
        weights = 1.0 / (encoding.qraw_den
                         * encoding.qraw_table.reshape(3, wrows, wcols))
    else:
        raise BitstreamError("invalid quant mode")

    inv = weights.copy()
    if np.any(inv < ALMOST_ZERO) or np.any(inv >= 1.0 / ALMOST_ZERO):
        # DC positions may hold markers; mask them out of validation.
        pass
    table = 1.0 / inv
    return table.astype(np.float32)


class DequantMatrices:
    """Holds per-strategy dequant tables (DequantMatrices in
    quant_weights.h). Tables are (3, rows8, cols8) with the wider side
    on cols (coefficient layout)."""

    def __init__(self):
        self.encodings = [QuantEncoding() for _ in range(acs.NUM_QUANT_TABLES)]
        self.dc_quant = DC_QUANT.copy()
        self.inv_dc_quant = INV_DC_QUANT.copy()
        self._tables: dict[int, np.ndarray] = {}

    # Library-mode (default-encoding) tables are format constants shared
    # by every frame — cache them process-wide instead of per instance.
    _library_tables: dict = {}

    def table(self, strategy: int) -> np.ndarray:
        """Dequant matrix for a strategy, shape (3, H, W) coefficient
        layout."""
        t_idx = acs.STRATEGY_QUANT_TABLE[strategy]
        if t_idx not in self._tables:
            enc = self.encodings[t_idx]
            if enc.mode == MODE_LIBRARY and not enc.predefined:
                lib = DequantMatrices._library_tables
                if t_idx not in lib:
                    lib[t_idx] = compute_quant_table(enc, t_idx)
                self._tables[t_idx] = lib[t_idx]
            else:
                self._tables[t_idx] = compute_quant_table(enc, t_idx)
        return self._tables[t_idx]

    # -- serialization (DequantMatrices::Decode / DecodeDC) ---------------

    def decode_dc(self, r: BitReader) -> None:
        all_default = r.read_bool()
        if not all_default:
            for c in range(3):
                v = read_f16(r) / 128.0
                if v < ALMOST_ZERO:
                    raise BitstreamError("invalid dc_quant")
                self.dc_quant[c] = v
                self.inv_dc_quant[c] = 1.0 / v

    def encode_dc(self, w: BitWriter) -> None:
        all_default = np.allclose(self.dc_quant, DC_QUANT)
        w.write_bool(all_default)
        if not all_default:
            for c in range(3):
                write_f16(self.dc_quant[c] * 128.0, w)

    def decode(self, r: BitReader, mfd=None) -> None:
        """DequantMatrices::Decode (quant_weights.cc:388-498): per-table
        quant encodings with all 8 modes, incl. RAW tables carried in
        modular sub-streams."""
        all_default = r.read_bool()
        self._tables.clear()
        if all_default:
            self.encodings = [QuantEncoding()
                              for _ in range(acs.NUM_QUANT_TABLES)]
            return
        self.encodings = []
        for idx in range(acs.NUM_QUANT_TABLES):
            self.encodings.append(_decode_quant_encoding(r, idx, mfd))

    def encode(self, w: BitWriter, mfe=None) -> None:
        all_default = all(e.mode == MODE_LIBRARY and not e.predefined
                          for e in self.encodings)
        w.write_bool(all_default)
        if all_default:
            return
        for idx, e in enumerate(self.encodings):
            _encode_quant_encoding(e, idx, w)


# -- quant encoding (de)serialization (quant_weights.cc:373-520) -----------
#
# Wire mode codes follow the reference enum order: 0=Library, 1=ID,
# 2=DCT2, 3=DCT4X8, 4=DCT4, 5=AFV, 6=DCT, 7=RAW (quant_weights.h).

_WIRE_TO_MODE = {0: MODE_LIBRARY, 1: MODE_ID, 2: MODE_DCT2, 3: MODE_DCT4X8,
                 4: MODE_DCT4, 5: MODE_AFV, 6: MODE_DCT, 7: MODE_RAW}
_MODE_TO_WIRE = {v: k for k, v in _WIRE_TO_MODE.items()}


def table_required_blocks(idx: int) -> tuple[int, int]:
    """(cols, rows) in 8x8 blocks of quant table `idx` (layout dims)."""
    for s in range(acs.NUM_STRATEGIES):
        if acs.STRATEGY_QUANT_TABLE[s] == idx:
            cx, cy = acs.covered_blocks(s)
            ly, lx = acs.coefficient_layout(cy, cx)
            return lx, ly
    raise ValueError(f"unknown quant table {idx}")


def _read_dct_params(r: BitReader) -> list:
    num = r.read(4) + 1
    bands = []
    for c in range(3):
        row = [read_f16(r) for _ in range(num)]
        row[0] *= 64.0
        if row[0] < ALMOST_ZERO:
            raise BitstreamError("distance band seed too small")
        bands.append(row)
    return bands


def _write_dct_params(bands: list, w: BitWriter) -> None:
    num = len(bands[0])
    w.write(4, num - 1)
    for c in range(3):
        for i in range(num):
            write_f16(bands[c][i] / (64.0 if i == 0 else 1.0), w)


def _read_f16_list(r, n, scale=1.0, check=True):
    out = []
    for _ in range(n):
        v = read_f16(r) * scale
        if check and abs(v) < ALMOST_ZERO:
            raise BitstreamError("quantizer weight too small")
        out.append(v)
    return out


def _decode_quant_encoding(r: BitReader, idx: int, mfd=None) -> QuantEncoding:
    lx, ly = table_required_blocks(idx)
    mode = _WIRE_TO_MODE[r.read(3)]
    e = QuantEncoding(mode=mode)
    if mode == MODE_LIBRARY:
        e.predefined = 0  # kCeilLog2NumPredefinedTables == 0: no bits
    elif mode == MODE_ID:
        e.idweights = [_read_f16_list(r, 3, 64.0) for _ in range(3)]
    elif mode == MODE_DCT2:
        e.dct2weights = [_read_f16_list(r, 6, 64.0) for _ in range(3)]
    elif mode == MODE_DCT4X8:
        e.dct4x8multipliers = [_read_f16_list(r, 1)[0] for _ in range(3)]
        e.dct_params = _read_dct_params(r)
    elif mode == MODE_DCT4:
        e.dct4multipliers = [_read_f16_list(r, 2) for _ in range(3)]
        e.dct_params = _read_dct_params(r)
    elif mode == MODE_AFV:
        e.afv_weights = []
        for c in range(3):
            row = _read_f16_list(r, 9, 1.0, check=False)
            for i in range(6):
                row[i] *= 64.0
            e.afv_weights.append(row)
        e.dct_params = _read_dct_params(r)
        e.dct_params_afv_4x4 = _read_dct_params(r)
    elif mode == MODE_DCT:
        e.dct_params = _read_dct_params(r)
    elif mode == MODE_RAW:
        from libjxl_tpu.modular.codec import modular_decode
        from libjxl_tpu.modular.image import ModularImage

        e.qraw_den = read_f16(r)
        if e.qraw_den < ALMOST_ZERO:
            raise BitstreamError("invalid qtable_den")
        img = ModularImage(lx * 8, ly * 8, 8, 3)
        gt = getattr(mfd, "global_tree", None) if mfd else None
        gc = getattr(mfd, "global_codes", None) if mfd else None
        # Stream id feeds the MA-tree group property
        # (dec_modular.h:59-61 ModularStreamId::QuantTable).
        stream = 0
        if mfd is not None:
            from libjxl_tpu.frame.modular_frame import stream_quant_table
            stream = stream_quant_table(idx, mfd.frame_dim)
        modular_decode(r, img, stream, global_tree=gt, global_codes=gc,
                       undo_transforms=True)
        table = np.stack([ch.data.ravel() for ch in img.channel])
        if (table <= 0).any():
            raise BitstreamError("raw quant table values must be positive")
        e.qraw_table = table.astype(np.int64)
    return e


def _encode_quant_encoding(e: QuantEncoding, idx: int, w: BitWriter) -> None:
    lx, ly = table_required_blocks(idx)
    w.write(3, _MODE_TO_WIRE[e.mode])
    if e.mode == MODE_LIBRARY:
        pass  # zero predefined bits
    elif e.mode == MODE_ID:
        for c in range(3):
            for i in range(3):
                write_f16(e.idweights[c][i] / 64.0, w)
    elif e.mode == MODE_DCT2:
        for c in range(3):
            for i in range(6):
                write_f16(e.dct2weights[c][i] / 64.0, w)
    elif e.mode == MODE_DCT4X8:
        for c in range(3):
            write_f16(e.dct4x8multipliers[c], w)
        _write_dct_params(e.dct_params, w)
    elif e.mode == MODE_DCT4:
        for c in range(3):
            for i in range(2):
                write_f16(e.dct4multipliers[c][i], w)
        _write_dct_params(e.dct_params, w)
    elif e.mode == MODE_AFV:
        for c in range(3):
            for i in range(9):
                v = e.afv_weights[c][i]
                write_f16(v / 64.0 if i < 6 else v, w)
        _write_dct_params(e.dct_params, w)
        _write_dct_params(e.dct_params_afv_4x4, w)
    elif e.mode == MODE_DCT:
        _write_dct_params(e.dct_params, w)
    elif e.mode == MODE_RAW:
        from libjxl_tpu.modular.codec import modular_encode
        from libjxl_tpu.modular.image import ModularImage

        write_f16(e.qraw_den, w)
        img = ModularImage.from_planes(
            [e.qraw_table[c].reshape(ly * 8, lx * 8).astype(np.int32)
             for c in range(3)], 8)
        modular_encode(img, w, 0)
