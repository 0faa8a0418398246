"""ctypes bindings + high-level wrappers for jxl_native.so."""

from __future__ import annotations

import ctypes as C
import os

import numpy as np

_lib = None
_tried = False


class TreeNodeC(C.Structure):
    _fields_ = [("property", C.c_int32), ("splitval", C.c_int32),
                ("lchild", C.c_int32), ("rchild", C.c_int32),
                ("predictor", C.c_int32), ("offset", C.c_int32),
                ("multiplier", C.c_int32)]


class WpHeaderC(C.Structure):
    _fields_ = [("p1c", C.c_int32), ("p2c", C.c_int32), ("p3ca", C.c_int32),
                ("p3cb", C.c_int32), ("p3cc", C.c_int32), ("p3cd", C.c_int32),
                ("p3ce", C.c_int32), ("w0", C.c_int32), ("w1", C.c_int32),
                ("w2", C.c_int32), ("w3", C.c_int32)]


class ChannelDescC(C.Structure):
    _fields_ = [("w", C.c_int32), ("h", C.c_int32), ("hshift", C.c_int32),
                ("vshift", C.c_int32), ("data", C.POINTER(C.c_int32))]


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("LIBJXL_TPU_NO_NATIVE"):
        return None
    from libjxl_tpu.native.build import build
    path = build()
    if path is None:
        return None
    lib = C.CDLL(path)
    lib.mod_decoder_create.restype = C.c_void_p
    lib.mod_decoder_create.argtypes = [
        C.c_char_p, C.c_uint64, C.c_uint64,
        C.POINTER(C.c_uint32),
        C.POINTER(C.c_uint8), C.POINTER(C.c_int32), C.c_int,
        C.c_int, C.c_uint32, C.c_uint32, C.c_uint32, C.POINTER(C.c_int32),
        C.c_uint32]
    lib.mod_decoder_bit_pos.restype = C.c_uint64
    lib.mod_decoder_bit_pos.argtypes = [C.c_void_p]
    lib.mod_decoder_check_final.restype = C.c_int
    lib.mod_decoder_check_final.argtypes = [C.c_void_p]
    lib.mod_decoder_set_prefix.restype = None
    lib.mod_decoder_set_prefix.argtypes = [C.c_void_p,
                                           C.POINTER(C.c_uint32)]
    lib.mod_decoder_destroy.argtypes = [C.c_void_p]
    lib.mod_decode_channel.restype = C.c_int
    lib.mod_decode_channel.argtypes = [
        C.c_void_p, C.POINTER(ChannelDescC), C.c_int, C.c_int, C.c_int,
        C.POINTER(TreeNodeC), C.c_int, C.POINTER(WpHeaderC)]
    lib.mod_encode_channel.restype = C.c_int64
    lib.mod_encode_channel.argtypes = [
        C.POINTER(ChannelDescC), C.c_int, C.c_int, C.c_int,
        C.POINTER(TreeNodeC), C.c_int, C.POINTER(WpHeaderC),
        C.POINTER(C.c_int32), C.POINTER(C.c_uint32), C.c_int64]
    lib.ans_write_tokens.restype = C.c_int64
    lib.ans_write_tokens.argtypes = [
        C.POINTER(C.c_int32), C.POINTER(C.c_uint32), C.c_int64,
        C.POINTER(C.c_uint8), C.POINTER(C.c_int32), C.c_int,
        C.POINTER(C.c_uint32), C.POINTER(C.c_uint32), C.POINTER(C.c_uint32),
        C.c_int, C.POINTER(C.c_uint8), C.c_int64, C.POINTER(C.c_int64)]
    lib.prefix_write_tokens.restype = C.c_int64
    lib.prefix_write_tokens.argtypes = [
        C.POINTER(C.c_int32), C.POINTER(C.c_uint32), C.c_int64,
        C.POINTER(C.c_uint8), C.POINTER(C.c_int32), C.c_int,
        C.POINTER(C.c_uint8), C.POINTER(C.c_uint16),
        C.c_int, C.POINTER(C.c_uint8), C.c_int64, C.POINTER(C.c_int64)]
    lib.token_histogram.restype = C.c_int64
    lib.token_histogram.argtypes = [
        C.POINTER(C.c_int32), C.POINTER(C.c_uint32), C.c_int64,
        C.c_int, C.c_int, C.c_int,
        C.POINTER(C.c_int64), C.c_int, C.c_int]
    lib.acs_expand.restype = C.c_int64
    lib.acs_expand.argtypes = [
        C.POINTER(C.c_int32), C.POINTER(C.c_int32), C.c_int64, C.c_int64,
        C.c_int64, C.c_int64, C.c_int64, C.c_int64,
        C.POINTER(C.c_int32), C.POINTER(C.c_int32), C.c_int64,
        C.POINTER(C.c_int32), C.POINTER(C.c_int32)]
    lib.lz77_match.restype = C.c_int64
    lib.lz77_match.argtypes = [
        C.POINTER(C.c_int64), C.POINTER(C.c_int64), C.c_int64,
        C.POINTER(C.c_int64), C.c_int64, C.c_int64, C.c_int64,
        C.POINTER(C.c_int64), C.POINTER(C.c_int64), C.POINTER(C.c_uint8)]
    lib.ans_read_histograms_build.restype = C.c_int64
    lib.ans_read_histograms_build.argtypes = [
        C.c_char_p, C.c_uint64, C.POINTER(C.c_uint64), C.c_int, C.c_int,
        C.c_int, C.POINTER(C.c_uint32), C.POINTER(C.c_int32)]
    lib.ans_read_stream_u32.restype = C.c_int64
    lib.ans_read_stream_u32.argtypes = [
        C.c_void_p, C.c_int, C.c_int64, C.POINTER(C.c_uint32)]
    lib.inverse_mtf_u32.restype = None
    lib.inverse_mtf_u32.argtypes = [C.POINTER(C.c_uint32), C.c_int64]
    lib.vardct_decode_ac_multi.restype = C.c_int
    lib.vardct_decode_ac_multi.argtypes = [
        C.c_int, C.POINTER(C.c_char_p), C.POINTER(C.c_uint64),
        C.POINTER(C.c_uint64), C.POINTER(C.c_uint32), C.POINTER(C.c_uint8),
        C.POINTER(C.c_int32), C.c_int, C.c_int,
        C.POINTER(C.c_int32), C.c_int,
        C.POINTER(C.c_int32), C.POINTER(C.c_int64),
        C.POINTER(C.c_int32), C.POINTER(C.c_int32), C.POINTER(C.c_int64),
        C.POINTER(C.c_int64), C.POINTER(C.c_int32), C.POINTER(C.c_int32),
        C.POINTER(C.c_int32), C.POINTER(C.c_int32), C.POINTER(C.c_int32),
        C.POINTER(C.c_int32), C.POINTER(C.c_int32), C.POINTER(C.c_int32),
        C.POINTER(C.c_int8), C.POINTER(C.c_int16), C.c_int64, C.c_int64,
        C.POINTER(C.c_int8), C.c_int64, C.POINTER(C.c_int32),
        C.POINTER(C.c_uint64), C.POINTER(C.c_int32),
        C.POINTER(C.c_int32), C.POINTER(C.c_int16), C.c_int64,
        C.POINTER(C.c_int64), C.c_int]
    lib.inv_rct3.restype = None
    lib.inv_rct3.argtypes = [C.POINTER(C.c_int32), C.POINTER(C.c_int32),
                             C.POINTER(C.c_int32), C.c_int64, C.c_int]
    lib.fwd_rct3.restype = None
    lib.fwd_rct3.argtypes = lib.inv_rct3.argtypes
    lib.interleave_clip_u8.restype = None
    lib.interleave_clip_u8.argtypes = [
        C.POINTER(C.c_void_p), C.c_int, C.c_int64, C.c_int32,
        C.POINTER(C.c_uint8)]
    lib.interleave_clip_u16.restype = None
    lib.interleave_clip_u16.argtypes = [
        C.POINTER(C.c_void_p), C.c_int, C.c_int64, C.c_int32,
        C.POINTER(C.c_uint16)]
    lib.vardct_decode_ac_frame.restype = C.c_int
    lib.vardct_decode_ac_frame.argtypes = [
        C.c_void_p, C.c_int, C.c_int, C.c_int,
        C.POINTER(C.c_int32), C.POINTER(C.c_int32),
        C.POINTER(C.c_int32), C.POINTER(C.c_int32),
        C.POINTER(C.c_int32), C.POINTER(C.c_int32),
        C.POINTER(C.c_int32), C.c_int, C.c_int,
        C.POINTER(C.c_int32), C.POINTER(C.c_int8),
        C.POINTER(C.c_int16), C.c_int64, C.c_int64, C.c_int64,
        C.POINTER(C.c_int8), C.c_int64, C.c_int64]
    lib.ma_split_search.restype = None
    lib.ma_split_search.argtypes = [
        C.POINTER(C.c_int32), C.POINTER(C.c_uint8),
        C.c_int, C.c_int, C.c_int64,
        C.POINTER(C.c_double), C.POINTER(C.c_int32)]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(C.POINTER(ctype))


def prefix_luts(codes):
    """Per-cluster 15-bit prefix decode LUTs (sym | len<<16), cached on
    the EntropyCodes object. Entry index = next 15 stream bits read
    LSB-first; canonical codes are MSB-first, so each (len, code) fills
    every index whose low `len` bits equal bit_reverse(code, len)."""
    cached = getattr(codes, "_prefix_lut_cache", None)
    if cached is None:
        n = codes.num_histograms
        lut = np.zeros((n, 1 << 15), np.uint32)
        for h, pc in enumerate(codes.prefix_codes):
            if pc.degenerate_symbol is not None:
                lut[h, :] = pc.degenerate_symbol  # len 0
                continue
            for (length, acc), sym in pc.table.items():
                rev = int(f"{acc:0{length}b}"[::-1], 2)
                step = 1 << length
                lut[h, rev::step] = sym | (length << 16)
        cached = np.ascontiguousarray(lut.reshape(-1))
        codes._prefix_lut_cache = cached
    return cached


def codes_tables(codes):
    """Packed alias slots (value:8 | offset:12 | (freq-1):12) + context
    map + uint configs for `codes`, cached on the EntropyCodes object
    and shared across sections/groups."""
    cached = getattr(codes, "_native_cache", None)
    if cached is None:
        packed = getattr(codes, "_packed_native", None)
        if packed is None:
            if codes.alias_tables is None and codes.counts is not None:
                from libjxl_tpu.entropy.codes import (
                    _python_encoder_tables)
                _python_encoder_tables(codes)
            value = np.concatenate(
                [t.value for t in codes.alias_tables]).astype(np.uint32)
            offset = np.concatenate(
                [t.offset for t in codes.alias_tables]).astype(np.uint32)
            freq = np.concatenate(
                [t.freq for t in codes.alias_tables]).astype(np.uint32)
            packed = (value | (offset << 8)
                      | (np.maximum(freq, 1) - 1 << 20))
        cmap = np.array(codes.context_map, np.uint8)
        cfgs = np.array(
            [[c.split_exponent, c.msb_in_token, c.lsb_in_token]
             for c in codes.uint_configs], np.int32)
        cached = (np.ascontiguousarray(packed), cmap, cfgs)
        codes._native_cache = cached
    return cached


def make_tree_array(tree) -> "C.Array":
    arr = (TreeNodeC * len(tree))()
    for i, n in enumerate(tree):
        arr[i] = TreeNodeC(n.property, n.splitval, n.lchild, n.rchild,
                           n.predictor, n.predictor_offset, n.multiplier)
    return arr


def make_wp_header(h) -> WpHeaderC:
    return WpHeaderC(h.p1c, h.p2c, h.p3ca, h.p3cb, h.p3cc, h.p3cd, h.p3ce,
                     h.w0, h.w1, h.w2, h.w3)


def make_channel_descs(channels, buffers):
    arr = (ChannelDescC * len(channels))()
    for i, (ch, buf) in enumerate(zip(channels, buffers)):
        arr[i] = ChannelDescC(ch.w, ch.h, ch.hshift, ch.vshift,
                              buf.ctypes.data_as(C.POINTER(C.c_int32)))
    return arr


class NativeModularDecoder:
    """Wraps the native ANS+modular decoder for one stream."""

    def __init__(self, data: bytes, bit_pos: int, codes, distance_mult: int):
        lib = get_lib()
        n = codes.num_histograms
        if codes.use_prefix_code:
            self._packed = np.zeros(1, np.uint32)  # unused in prefix mode
            self._lut = prefix_luts(codes)
            self._cmap = np.array(codes.context_map, np.uint8)
            self._cfgs = np.array(
                [[c.split_exponent, c.msb_in_token, c.lsb_in_token]
                 for c in codes.uint_configs], np.int32)
        else:
            self._lut = None
            self._packed, self._cmap, self._cfgs = codes_tables(codes)
        lz = codes.lz77
        self._lzcfg = np.array(
            [lz.length_uint_config.split_exponent,
             lz.length_uint_config.msb_in_token,
             lz.length_uint_config.lsb_in_token], np.int32)
        self._data = data  # keep alive
        self.handle = lib.mod_decoder_create(
            data, len(data), bit_pos,
            _as_ptr(self._packed, C.c_uint32),
            _as_ptr(self._cmap, C.c_uint8),
            _as_ptr(self._cfgs, C.c_int32), n,
            1 if lz.enabled else 0, lz.min_symbol, lz.min_length,
            codes.lz77_distance_ctx if lz.enabled else 0,
            _as_ptr(self._lzcfg, C.c_int32), distance_mult)
        if self._lut is not None:
            lib.mod_decoder_set_prefix(self.handle,
                                       _as_ptr(self._lut, C.c_uint32))
        self.lib = lib

    def decode_channel(self, chan_descs, num_chans, chan_idx, group_id,
                       tree_arr, num_nodes, wp_hdr) -> int:
        return self.lib.mod_decode_channel(
            self.handle, chan_descs, num_chans, chan_idx, group_id,
            tree_arr, num_nodes, C.byref(wp_hdr))

    def bit_pos(self) -> int:
        return self.lib.mod_decoder_bit_pos(self.handle)

    def check_final(self) -> bool:
        return bool(self.lib.mod_decoder_check_final(self.handle))

    def close(self):
        if self.handle:
            self.lib.mod_decoder_destroy(self.handle)
            self.handle = None

    def __del__(self):
        self.close()


def rct3(c0: np.ndarray, c1: np.ndarray, c2: np.ndarray,
         custom: int, forward: bool) -> None:
    """In-place RCT arithmetic on three contiguous int32 planes
    (rct.cc); the caller handles the channel permutation."""
    lib = get_lib()
    fn = lib.fwd_rct3 if forward else lib.inv_rct3
    fn(_as_ptr(c0, C.c_int32), _as_ptr(c1, C.c_int32),
       _as_ptr(c2, C.c_int32), c0.size, custom)


def interleave_clip(planes, maxval: int, dtype) -> np.ndarray:
    """(k) int32 HxW planes -> (H, W, k) clipped uint8/uint16."""
    lib = get_lib()
    h, w = planes[0].shape
    k = len(planes)
    ptrs = (C.c_void_p * k)(*[p.ctypes.data for p in planes])
    ptrs_cast = C.cast(ptrs, C.POINTER(C.c_void_p))
    out = np.empty((h, w, k), dtype)
    if dtype == np.uint8:
        lib.interleave_clip_u8(ptrs_cast, k, h * w, maxval,
                               out.ctypes.data_as(C.POINTER(C.c_uint8)))
    else:
        lib.interleave_clip_u16(ptrs_cast, k, h * w, maxval,
                                out.ctypes.data_as(C.POINTER(C.c_uint16)))
    return out


def ma_split_search(feat: np.ndarray, cls: np.ndarray):
    """Native MA-tree node split search (enc_ma.cc ComputeBestTree inner
    loop). feat: (nprops, ns) int32 C-contiguous; cls: (kpred, ns) uint8.
    Returns (base_cost, base_k, gain, prop_i, splitval, lk, rk);
    prop_i == -1 when no valid cut improves on the unsplit node."""
    lib = get_lib()
    out_f = (C.c_double * 2)()
    out_i = (C.c_int32 * 5)()
    lib.ma_split_search(_as_ptr(feat, C.c_int32), _as_ptr(cls, C.c_uint8),
                        feat.shape[0], cls.shape[0], feat.shape[1],
                        out_f, out_i)
    return (out_f[0], int(out_i[0]), out_f[1], int(out_i[1]),
            int(out_i[2]), int(out_i[3]), int(out_i[4]))
