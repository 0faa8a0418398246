"""Modular <-> frame glue: global info, group streams, VarDCT fields.

Reference: lib/jxl/dec_modular.{h,cc} (ModularFrameDecoder,
ModularStreamId), enc_modular.{h,cc} (ModularFrameEncoder). The frame's
modular "full image" spans all channels; small channels ride the global
stream, big ones are split per group with shift brackets.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from libjxl_tpu.base.errors import BitstreamError, UnsupportedError
from libjxl_tpu.base.frame_dimensions import FrameDimensions
from libjxl_tpu.base.rect import Rect
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import bundle_read, bundle_write
from libjxl_tpu.modular.codec import (
    GroupHeader, Transform, modular_decode, modular_encode,
    _decode_channel, _encode_channel, _apply_forward_transform,
)
from libjxl_tpu.modular.image import Channel, ModularImage
from libjxl_tpu.modular.predict import P_GRADIENT, P_ZERO, WPHeader
from libjxl_tpu.modular.tree import (
    Tree, decode_tree, encode_tree, leaf, num_tree_contexts,
    build_fixed_tree_list,
)
from libjxl_tpu.vardct.ac_strategy import NUM_QUANT_TABLES

# ModularStreamId (dec_modular.h:31-68)


def stream_global() -> int:
    return 0


def stream_vardct_dc(group_id: int, fd: FrameDimensions) -> int:
    return 1 + group_id


def stream_modular_dc(group_id: int, fd: FrameDimensions) -> int:
    return 1 + fd.num_dc_groups + group_id


def stream_ac_metadata(group_id: int, fd: FrameDimensions) -> int:
    return 1 + 2 * fd.num_dc_groups + group_id


def stream_quant_table(idx: int, fd: FrameDimensions) -> int:
    return 1 + 3 * fd.num_dc_groups + idx


def stream_modular_ac(group_id: int, pass_id: int,
                      fd: FrameDimensions) -> int:
    return 1 + 3 * fd.num_dc_groups + NUM_QUANT_TABLES \
        + fd.num_groups * pass_id + group_id


class ModularFrameDecoder:
    """dec_modular.cc ModularFrameDecoder."""

    def __init__(self, frame_dim: FrameDimensions):
        self.frame_dim = frame_dim
        self.global_tree: Tree | None = None
        self.global_codes = None
        self.global_header = GroupHeader()
        self.full_image: ModularImage | None = None
        self.do_color = False

    def decode_global_info(self, r: BitReader, frame_header,
                           metadata) -> None:
        """dec_modular.cc:209-330 DecodeGlobalInfo."""
        from libjxl_tpu.entropy.codes import decode_histograms
        from libjxl_tpu.frame.frame_header import (
            ColorTransform, FrameEncoding)

        fd = self.frame_dim
        decode_color = frame_header.encoding == FrameEncoding.MODULAR
        self.do_color = decode_color
        is_gray = metadata.m.color_encoding.is_gray
        nb_chans = 1 if (is_gray and frame_header.color_transform
                         == ColorTransform.NONE) else 3
        nb_extra = metadata.m.num_extra_channels
        has_tree = r.read_bool()
        if has_tree:
            tree_size_limit = min(1 << 22, 1024 + fd.xsize * fd.ysize
                                  * (nb_chans + nb_extra) // 16)
            self.global_tree = decode_tree(r, tree_size_limit)
            self.global_codes = decode_histograms(
                r, num_tree_contexts(self.global_tree))
        if not decode_color:
            nb_chans = 0

        gi = ModularImage(fd.xsize, fd.ysize,
                          metadata.m.bit_depth.bits_per_sample,
                          nb_chans + nb_extra)
        if frame_header.color_transform == ColorTransform.YCBCR:
            for c in range(nb_chans):
                hs = frame_header.chroma_subsampling.hshift(c)
                vs = frame_header.chroma_subsampling.vshift(c)
                w = -(-fd.xsize // (1 << hs))
                h = -(-fd.ysize // (1 << vs))
                gi.channel[c] = Channel.create(w, h, hs, vs)
        # extra channels with dim_shift / ec_upsampling
        for i, eci in enumerate(metadata.m.extra_channel_info):
            c = nb_chans + i
            ecups = frame_header.extra_channel_upsampling[i] \
                if frame_header.extra_channel_upsampling else 1
            w = -(-fd.xsize_upsampled // ecups)
            h = -(-fd.ysize_upsampled // ecups)
            shift = (ecups // max(frame_header.upsampling, 1)).bit_length() - 1
            gi.channel[c] = Channel.create(w, h, 0, 0)

        self.full_image = gi
        # Decode global stream: transforms + channels <= group_dim.
        header = GroupHeader()
        modular_decode(r, gi, stream_global(), global_tree=self.global_tree,
                       global_codes=self.global_codes, header=header,
                       undo_transforms=False, max_chan_size=fd.group_dim)
        self.global_header = header

    def decode_group(self, rect: Rect, r: BitReader, min_shift: int,
                     max_shift: int, stream_id: int) -> None:
        """dec_modular.cc:331-425 DecodeGroup."""
        gi = self.full_image
        fd = self.frame_dim
        sub = ModularImage(rect.xsize, rect.ysize, gi.bitdepth, 0)
        targets = []
        c = gi.nb_meta_channels
        while c < len(gi.channel):
            fc = gi.channel[c]
            if fc.w > fd.group_dim or fc.h > fd.group_dim:
                break
            c += 1
        for c in range(c, len(gi.channel)):
            fc = gi.channel[c]
            shift = min(fc.hshift, fc.vshift)
            if shift > max_shift or shift < min_shift:
                continue
            rr = Rect.clamped(rect.x0 >> fc.hshift, rect.y0 >> fc.vshift,
                              rect.xsize >> fc.hshift,
                              rect.ysize >> fc.vshift, fc.w, fc.h)
            if rr.is_empty():
                continue
            ch = Channel.create(rr.xsize, rr.ysize, fc.hshift, fc.vshift)
            sub.channel.append(ch)
            targets.append((c, rr))
        if not sub.channel:
            return
        # Group streams read their own GroupHeader and may carry LOCAL
        # transforms (e.g. per-group palette/RCT at high efforts) which
        # must be undone before stitching (dec_modular.cc:393
        # ModularGenericDecompress with undo_transforms=true; global
        # transforms are undone later in finalize()).
        modular_decode(r, sub, stream_id, global_tree=self.global_tree,
                       global_codes=self.global_codes,
                       undo_transforms=True)
        for (c, rr), ch in zip(targets, sub.channel):
            gi.channel[c].data[rr.slices()] = ch.data

    def finalize(self) -> ModularImage:
        """Undo global transforms on the assembled full image."""
        gi = self.full_image
        for t in reversed(self.global_header.transforms):
            t.inverse(gi, self.global_header.wp_header)
        return gi

    # -- VarDCT auxiliary streams ----------------------------------------

    def decode_vardct_dc(self, group_id: int, r: BitReader,
                         bitdepth: int = 8, shifts=None):
        """dec_modular.cc:427-465: returns (quantized dc (3,h,w) or
        per-channel list when chroma-subsampled, extra precision).

        shifts: optional [(h, v)] per channel (X, Y, B) for subsampled
        chroma; channels then have subsampled dims."""
        fd = self.frame_dim
        rect = fd.dc_group_rect(group_id)
        extra_precision = r.read(2)
        img = ModularImage(rect.xsize, rect.ysize, bitdepth, 3)
        if shifts is not None:
            for stream_c, c in enumerate((1, 0, 2)):
                h, v = shifts[c]
                w_ = -(-rect.xsize // (1 << h))
                h_ = -(-rect.ysize // (1 << v))
                img.channel[stream_c] = Channel.create(w_, h_, h, v)
        modular_decode(r, img, stream_vardct_dc(group_id, fd),
                       global_tree=self.global_tree,
                       global_codes=self.global_codes,
                       undo_transforms=True)
        # channel order in stream: Y, X, B (c<2 ? c^1 : c)
        if shifts is not None:
            return [img.channel[1].data, img.channel[0].data,
                    img.channel[2].data], extra_precision
        dc = np.stack([img.channel[1].data, img.channel[0].data,
                       img.channel[2].data])
        return dc, extra_precision

    def decode_ac_metadata(self, group_id: int, r: BitReader,
                           bitdepth: int = 8) -> dict:
        """dec_modular.cc:467-563: returns dict with ytox/ytob maps,
        raw quant field, strategy map, epf sharpness for this DC group
        rect."""
        from libjxl_tpu.vardct import ac_strategy as acs_mod

        fd = self.frame_dim
        rect = fd.dc_group_rect(group_id)
        upper_bound = rect.xsize * rect.ysize
        nbits = max((upper_bound - 1).bit_length(), 0) if upper_bound > 1 \
            else 0
        count = r.read(nbits) + 1 if upper_bound > 1 else r.read(0) + 1
        img = ModularImage(rect.xsize, rect.ysize, bitdepth, 4)
        cr_w = (rect.xsize + 7) >> 3
        cr_h = (rect.ysize + 7) >> 3
        img.channel[0] = Channel.create(cr_w, cr_h, 3, 3)
        img.channel[1] = Channel.create(cr_w, cr_h, 3, 3)
        img.channel[2] = Channel.create(count, 2, 0, 0)
        img.channel[3] = Channel.create(rect.xsize, rect.ysize, 0, 0)
        modular_decode(r, img, stream_ac_metadata(group_id, fd),
                       global_tree=self.global_tree,
                       global_codes=self.global_codes,
                       undo_transforms=True)
        ytox = img.channel[0].data
        ytob = img.channel[1].data
        acs_vals = img.channel[2].data[0]
        qf_vals = img.channel[2].data[1]
        epf = img.channel[3].data
        # Expand acs/qf streams into per-block maps (native fast path;
        # the Python scan below is the bit-identical oracle).
        native = _acs_expand_native(acs_vals, qf_vals, rect, fd)
        if native is not None:
            strategies, raw_quant = native
            return {"ytox": ytox, "ytob": ytob,
                    "strategies": strategies,
                    "raw_quant": raw_quant, "epf": epf}
        strategies = np.full((rect.ysize, rect.xsize), -1, np.int32)
        raw_quant = np.ones((rect.ysize, rect.xsize), np.int32)
        covered = np.zeros((rect.ysize, rect.xsize), bool)
        num = 0
        for iy in range(rect.ysize):
            for ix in range(rect.xsize):
                if covered[iy, ix]:
                    continue
                if num >= count:
                    raise BitstreamError("AC metadata stream too short")
                raw_s = int(acs_vals[num])
                if not acs_mod.is_valid_strategy(raw_s):
                    raise BitstreamError("invalid AC strategy")
                cx, cy = acs_mod.covered_blocks(raw_s)
                # Blocks must not cross AC group boundaries.
                gdb = fd.group_dim // 8
                if ((rect.x0 + ix) % gdb) + cx > gdb or \
                        ((rect.y0 + iy) % gdb) + cy > gdb:
                    raise BitstreamError("AC strategy crosses group")
                if iy + cy > rect.ysize or ix + cx > rect.xsize:
                    raise BitstreamError("AC strategy out of bounds")
                if covered[iy:iy + cy, ix:ix + cx].any():
                    raise BitstreamError("AC strategy overlap")
                strategies[iy, ix] = raw_s
                covered[iy:iy + cy, ix:ix + cx] = True
                raw_quant[iy:iy + cy, ix:ix + cx] = \
                    1 + max(0, min(255, int(qf_vals[num])))
                num += 1
        if num != count:
            raise BitstreamError("AC metadata count mismatch")
        return {"ytox": ytox, "ytob": ytob, "strategies": strategies,
                "raw_quant": raw_quant, "epf": epf}



def _acs_expand_native(acs_vals, qf_vals, rect, fd):
    """Native AC-metadata expansion; None => Python fallback."""
    import ctypes as C

    try:
        from libjxl_tpu.native.bindings import get_lib
        lib = get_lib()
    except Exception:
        return None
    if lib is None:
        return None
    from libjxl_tpu.vardct import ac_strategy as acs_mod
    av = np.ascontiguousarray(acs_vals, np.int32)
    qv = np.ascontiguousarray(qf_vals, np.int32)
    cov_x = np.asarray(acs_mod.COVERED_X, np.int32)
    cov_y = np.asarray(acs_mod.COVERED_Y, np.int32)
    strategies = np.empty((rect.ysize, rect.xsize), np.int32)
    raw_quant = np.empty((rect.ysize, rect.xsize), np.int32)
    p32 = C.POINTER(C.c_int32)
    rc = lib.acs_expand(
        av.ctypes.data_as(p32), qv.ctypes.data_as(p32), len(av),
        rect.xsize, rect.ysize, rect.x0, rect.y0, fd.group_dim // 8,
        cov_x.ctypes.data_as(p32), cov_y.ctypes.data_as(p32),
        acs_mod.NUM_STRATEGIES,
        strategies.ctypes.data_as(p32), raw_quant.ctypes.data_as(p32))
    if rc < 0:
        msgs = {-1: "AC metadata stream too short",
                -2: "invalid AC strategy",
                -3: "AC strategy crosses group",
                -4: "AC strategy out of bounds",
                -5: "AC strategy overlap",
                -6: "AC metadata count mismatch"}
        raise BitstreamError(msgs.get(int(rc), "AC metadata error"))
    return strategies, raw_quant

# ---------------------------------------------------------------------------
# Encoder side


# Fixed tree used by our encoder for VarDCT control-field streams:
# single Gradient leaf (valid; the reference uses richer fixed trees
# for density, enc_modular.cc kACMeta — parity work for later rounds).
def _simple_tree(predictor: int = P_GRADIENT) -> Tree:
    return [leaf(0, predictor, 0, 1)]


class ModularFrameEncoder:
    """Produces the modular sub-streams for a frame (enc_modular.cc)."""

    def __init__(self, frame_dim: FrameDimensions):
        self.frame_dim = frame_dim

    def encode_global_info(self, w: BitWriter, *,
                           full_image: ModularImage | None = None,
                           transforms: list | None = None,
                           predictor: int = P_GRADIENT) -> dict | None:
        """Writes has_tree=0 + the global modular stream: GroupHeader
        (with the frame's transform list) + local tree + tokens for all
        channels up to the first non-meta channel exceeding group_dim
        (matching modular_decode's max_chan_size cutoff).

        For modular-mode frames pass full_image (frame-sized channels);
        returns state for encode_group calls (the transformed image)."""
        from libjxl_tpu.entropy.codes import (
            build_and_encode_histograms, write_tokens)

        w.write_bool(False)  # no global tree; streams carry local trees
        header = GroupHeader()
        header.transforms = transforms or []
        fd = self.frame_dim
        if full_image is None:
            # VarDCT frame with no extra channels: the global modular
            # image is empty, and ModularDecode early-returns before
            # even reading a GroupHeader (encoding.cc:561) — so the
            # stream body is empty.
            return None
        work = full_image.clone()
        for t in header.transforms:
            _apply_forward_transform(work, t)
        bundle_write(header, w)
        small = []
        for i, ch in enumerate(work.channel):
            if i >= work.nb_meta_channels and \
                    (ch.w > fd.group_dim or ch.h > fd.group_dim):
                break
            if ch.w and ch.h:
                small.append(i)
        if small:
            from libjxl_tpu.modular.codec import encode_channels_tokens
            tree = _simple_tree(predictor)
            encode_tree(tree, w)
            tokens = encode_channels_tokens(work, small, tree,
                                            header.wp_header, 0)
            codes = build_and_encode_histograms(num_tree_contexts(tree),
                                                [tokens], w)
            write_tokens(tokens, codes, w)
        return {"image": work, "predictor": predictor}

    def _build_sub_image(self, image: ModularImage, rect: Rect,
                         min_shift: int, max_shift: int) -> ModularImage:
        """Extracts the per-group sub-image of big channels whose shift
        is within [min_shift, max_shift] (enc_modular.cc stream split)."""
        fd = self.frame_dim
        sub = ModularImage(rect.xsize, rect.ysize, image.bitdepth, 0)
        c = image.nb_meta_channels
        while c < len(image.channel):
            fc = image.channel[c]
            if fc.w > fd.group_dim or fc.h > fd.group_dim:
                break
            c += 1
        for c in range(c, len(image.channel)):
            fc = image.channel[c]
            shift = min(fc.hshift, fc.vshift)
            if shift > max_shift or shift < min_shift:
                continue
            rr = Rect.clamped(rect.x0 >> fc.hshift, rect.y0 >> fc.vshift,
                              rect.xsize >> fc.hshift,
                              rect.ysize >> fc.vshift, fc.w, fc.h)
            if rr.is_empty():
                continue
            ch = Channel(fc.data[rr.slices()].copy(), fc.hshift, fc.vshift)
            sub.channel.append(ch)
        return sub

    def encode_group(self, w: BitWriter, state: dict, rect: Rect,
                     min_shift: int, max_shift: int) -> None:
        """Per-group stream of rect slices of big channels."""
        sub = self._build_sub_image(state["image"], rect, min_shift,
                                    max_shift)
        if not sub.channel:
            return  # geometrically empty stream: write nothing
        self._encode_stream_image(w, sub, state["predictor"])

    # -- Global-tree lossless path (enc_modular.cc with a learned tree) --

    def prepare_global_tree(self, full_image: ModularImage,
                            transforms: list, fh,
                            learn: bool = True,
                            quantize: "callable|None" = None,
                            use_prefix: bool = False,
                            try_lz77: bool = True) -> dict:
        """Applies transforms, learns a global MA tree, and tokenizes
        every stream up-front so LfGlobal can carry the shared tree +
        clustered histograms.

        quantize: optional fn(channel_index, Channel) -> None mutating
        each non-meta channel AFTER the forward transforms — the lossy
        modular hook (enc_modular.cc:1010-1035 QuantizeChannel)."""
        from libjxl_tpu.entropy.codes import stream_arrays
        from libjxl_tpu.frame.ma_learn import learn_tree
        from libjxl_tpu.modular.codec import encode_channels_tokens

        fd = self.frame_dim
        work = full_image.clone()
        for t in transforms:
            _apply_forward_transform(work, t)

        if quantize is not None:
            for i in range(work.nb_meta_channels, len(work.channel)):
                quantize(i, work.channel[i])
        first_big = work.nb_meta_channels
        while first_big < len(work.channel):
            fc = work.channel[first_big]
            if fc.w > fd.group_dim or fc.h > fd.group_dim:
                break
            first_big += 1

        # Learn on the big channels with their in-stream indices (0-based
        # within group streams); fall back to all channels for small
        # images.
        if first_big < len(work.channel):
            learn_chans = [work.channel[i].data
                           for i in range(first_big, len(work.channel))]
            learn_idx = list(range(len(learn_chans)))
        else:
            learn_chans = [c.data for c in work.channel if c.w and c.h]
            learn_idx = list(range(len(learn_chans)))
        tree = learn_tree(learn_chans, learn_idx) if learn \
            else _simple_tree(P_GRADIENT)

        header = GroupHeader()
        header.use_global_tree = True
        header.transforms = transforms

        streams = {}  # stream_id -> token arrays (or lz77 triples)
        stream_dm = {}
        all_tokens = []
        # Global stream: meta + small channels.
        small = [i for i in range(first_big)
                 if work.channel[i].w and work.channel[i].h]
        if small:
            g_tokens = encode_channels_tokens(work, small, tree,
                                              header.wp_header, 0)
            streams[stream_global()] = g_tokens
            stream_dm[stream_global()] = max(
                (work.channel[i].w for i in small), default=0)
            all_tokens.append(g_tokens)
        # DC group streams (shift >= 3) and AC group streams.
        specs = []
        for g in range(fd.num_dc_groups):
            rect = fd.dc_group_rect(g)
            mrect = Rect(rect.x0 * 8, rect.y0 * 8, fd.dc_group_dim,
                         fd.dc_group_dim)
            specs.append((mrect, 3, 1000, stream_modular_dc(g, fd)))
        min_s, max_s = fh.passes.downsampling_bracket(0)
        for g in range(fd.num_groups):
            mrect = fd.group_rect(g)
            # UNCLIPPED rect (see decode_frame modular AC loop): the
            # per-channel clamp against fc.w/fc.h keeps odd-width
            # squeezed channels whole.
            specs.append((Rect(mrect.x0, mrect.y0, fd.group_dim,
                               fd.group_dim), min_s, max_s,
                          stream_modular_ac(g, 0, fd)))
        for (rect, mn, mx, sid) in specs:
            sub = self._build_sub_image(work, rect, mn, mx)
            live = [i for i, c in enumerate(sub.channel) if c.w and c.h]
            if not live:
                continue
            tokens = encode_channels_tokens(sub, live, tree,
                                            header.wp_header, sid)
            streams[sid] = tokens
            stream_dm[sid] = max(
                (sub.channel[i].w for i in live), default=0)
            all_tokens.append(tokens)

        # LZ77 pass: adopt when the token streams show repetition and
        # matching meaningfully shrinks them (enc_ans.cc ApplyLZ77).
        import os
        from libjxl_tpu.entropy.codes import apply_lz77, lz77_worth_trying
        use_lz77 = False
        if not try_lz77 or os.environ.get("LIBJXL_TPU_NO_LZ77"):
            return {"image": work, "tree": tree, "header": header,
                    "streams": streams, "all_tokens": all_tokens,
                    "lz_streams": None, "codes": None,
                    "use_prefix": use_prefix}
        lz_streams = {}
        orig_total = sum(len(t[0]) if isinstance(t, tuple) else len(t)
                         for t in streams.values()) or 1
        if any(lz77_worth_trying(t[1]) for t in streams.values()
               if isinstance(t, tuple)):
            from libjxl_tpu.entropy.codes import stream_bits_proxy
            nctx = num_tree_contexts(tree) + 1
            plain_bits = 0.0
            lz_bits = 0.0
            for sid, t in streams.items():
                if not isinstance(t, tuple):
                    lz_streams = {}
                    break
                ctx, val = t
                ctx64 = np.asarray(ctx, np.int64)
                val64 = np.asarray(val, np.int64)
                lz = apply_lz77(ctx64, val64, stream_dm.get(sid, 0))
                if lz is None:
                    lz = (ctx64, val64, np.zeros(len(val), np.uint8))
                lz_streams[sid] = lz
                plain_bits += stream_bits_proxy(ctx64, val64,
                                                num_contexts=nctx)
                lz_bits += stream_bits_proxy(lz[0], lz[1], lz[2],
                                             num_contexts=nctx)
            if lz_streams and lz_bits < 0.98 * plain_bits:
                use_lz77 = True
        return {"image": work, "tree": tree, "header": header,
                "streams": streams, "all_tokens": all_tokens,
                "lz_streams": lz_streams if use_lz77 else None,
                "codes": None, "use_prefix": use_prefix}

    def write_global_with_tree(self, w: BitWriter, state: dict) -> None:
        """LfGlobal modular payload: has_tree=1, tree, histograms over
        all streams, then the global stream."""
        from libjxl_tpu.entropy.codes import (
            build_and_encode_histograms, write_tokens)

        w.write_bool(True)
        tree = state["tree"]
        encode_tree(tree, w)
        if state.get("lz_streams"):
            from libjxl_tpu.entropy.codes import (
                build_and_encode_histograms_lz77, write_tokens_lz77)
            state["codes"] = build_and_encode_histograms_lz77(
                num_tree_contexts(tree),
                list(state["lz_streams"].values()), w)
            bundle_write(state["header"], w)
            lz = state["lz_streams"].get(stream_global())
            if lz is not None:
                write_tokens_lz77(lz, state["codes"], w)
            return
        state["codes"] = build_and_encode_histograms(
            num_tree_contexts(tree), state["all_tokens"], w,
            use_prefix_code=state.get("use_prefix", False))
        bundle_write(state["header"], w)
        tokens = state["streams"].get(stream_global())
        if tokens is not None:
            write_tokens(tokens, state["codes"], w)

    def write_group_with_tree(self, w: BitWriter, state: dict,
                              stream_id: int) -> None:
        from libjxl_tpu.entropy.codes import write_tokens, \
            write_tokens_lz77

        tokens = state["streams"].get(stream_id)
        if tokens is None:
            return  # geometrically empty stream: write nothing
        header = GroupHeader()
        header.use_global_tree = True
        bundle_write(header, w)
        if state.get("lz_streams"):
            write_tokens_lz77(state["lz_streams"][stream_id],
                              state["codes"], w)
        else:
            write_tokens(tokens, state["codes"], w)

    def _encode_stream_image(self, w: BitWriter, sub: ModularImage,
                             predictor: int, tree: Tree | None = None,
                             stream_id: int = 0) -> None:
        from libjxl_tpu.entropy.codes import (
            build_and_encode_histograms, write_tokens)

        header = GroupHeader()
        bundle_write(header, w)
        live = [i for i, c in enumerate(sub.channel)
                if c.w > 0 and c.h > 0]
        if not live:
            return
        if tree is None:
            tree = _simple_tree(predictor)
        encode_tree(tree, w)
        from libjxl_tpu.modular.codec import encode_channels_tokens
        tokens = encode_channels_tokens(sub, live, tree, header.wp_header,
                                        stream_id)
        codes = build_and_encode_histograms(num_tree_contexts(tree),
                                            [tokens], w)
        write_tokens(tokens, codes, w)

    # -- VarDCT auxiliary streams ----------------------------------------

    @staticmethod
    def build_vardct_dc_image(qdc, bitdepth: int = 8,
                              shifts=None) -> ModularImage:
        """qdc: (3, h, w) quantized DC in X,Y,B order, or a 3-list of
        per-channel arrays when chroma-subsampled (with `shifts`)."""
        if shifts is not None:
            img = ModularImage(qdc[1].shape[1], qdc[1].shape[0],
                               bitdepth, 3)
            for stream_c, c in enumerate((1, 0, 2)):
                h, v = shifts[c]
                img.channel[stream_c] = Channel(
                    qdc[c].astype(np.int32), h, v)
        else:
            img = ModularImage(qdc.shape[2], qdc.shape[1], bitdepth, 3)
            # stream channel order: Y, X, B
            img.channel[0] = Channel(qdc[1].astype(np.int32))
            img.channel[1] = Channel(qdc[0].astype(np.int32))
            img.channel[2] = Channel(qdc[2].astype(np.int32))
        return img

    @staticmethod
    def _wp_fixed_dc_tree(img: ModularImage, bitdepth: int):
        from libjxl_tpu.modular.tree import (
            WP_FIXED_DC_CUTOFFS, WP_PROP, make_fixed_tree)
        from libjxl_tpu.modular.predict import P_WEIGHTED
        npix = sum(c.w * c.h for c in img.channel)
        return make_fixed_tree(WP_PROP, WP_FIXED_DC_CUTOFFS, P_WEIGHTED,
                               npix, bitdepth)

    def encode_vardct_dc(self, w: BitWriter, qdc,
                         bitdepth: int = 8, shifts=None) -> None:
        w.write(2, 0)  # extra_precision = 0
        img = self.build_vardct_dc_image(qdc, bitdepth, shifts)
        # kWPFixedDC (enc_modular.cc:1591-1595): weighted predictor
        # with the fixed WP-error split tree — much denser than plain
        # gradient on smooth DC planes.
        from libjxl_tpu.modular.predict import P_WEIGHTED
        tree = self._wp_fixed_dc_tree(img, bitdepth)
        self._encode_stream_image(w, img, P_WEIGHTED, tree=tree)

    @staticmethod
    def build_ac_metadata_image(rect: Rect, ytox: np.ndarray,
                                ytob: np.ndarray, strategies: np.ndarray,
                                raw_quant: np.ndarray, epf: np.ndarray,
                                bitdepth: int = 8):
        """Returns (ModularImage, count) for one AC-metadata stream."""
        acs_list = []
        qf_list = []
        for iy in range(rect.ysize):
            for ix in range(rect.xsize):
                s = int(strategies[iy, ix])
                if s < 0:
                    continue
                acs_list.append(s)
                qf_list.append(int(raw_quant[iy, ix]) - 1)
        count = len(acs_list)
        img = ModularImage(rect.xsize, rect.ysize, bitdepth, 4)
        img.channel[0] = Channel(ytox.astype(np.int32), 3, 3)
        img.channel[1] = Channel(ytob.astype(np.int32), 3, 3)
        img.channel[2] = Channel(
            np.stack([acs_list, qf_list]).astype(np.int32), 0, 0)
        img.channel[3] = Channel(epf.astype(np.int32), 0, 0)
        return img, count

    @staticmethod
    def _write_acmeta_count(w: BitWriter, rect: Rect, count: int) -> None:
        upper_bound = rect.xsize * rect.ysize
        nbits = max((upper_bound - 1).bit_length(), 0) if upper_bound > 1 \
            else 0
        if nbits:
            w.write(nbits, count - 1)

    def encode_ac_metadata(self, w: BitWriter, rect: Rect,
                           ytox: np.ndarray, ytob: np.ndarray,
                           strategies: np.ndarray, raw_quant: np.ndarray,
                           epf: np.ndarray, bitdepth: int = 8) -> None:
        img, count = self.build_ac_metadata_image(
            rect, ytox, ytob, strategies, raw_quant, epf, bitdepth)
        self._write_acmeta_count(w, rect, count)
        from libjxl_tpu.modular.tree import ac_meta_tree
        self._encode_stream_image(w, img, P_ZERO, tree=ac_meta_tree())

    # -- learned global tree over the VarDCT auxiliary streams ----------

    def prepare_vardct_aux(self, dc_entries: list, acmeta_entries: list,
                           bitdepth: int = 8):
        """Learn ONE global MA tree + shared histograms over every DC
        and AC-metadata stream of a VarDCT frame (enc_modular.cc
        squirrel-and-slower: the LfGlobal tree amortizes per-stream
        tree/histogram costs and specializes by stream id, property 1).

        dc_entries: [(group_id, ModularImage)];
        acmeta_entries: [(group_id, rect, count, ModularImage)].
        Returns a state dict for the write_* methods below, or None
        when the learned variant measures LARGER than the per-stream
        fixed trees (both variants are trial-serialized exactly)."""
        from libjxl_tpu.frame.ma_learn import learn_tree
        from libjxl_tpu.modular.codec import encode_channels_tokens

        fd = self.frame_dim
        entries = []   # (stream_id, img)
        chans, idxs, sids = [], [], []
        for g, img in dc_entries:
            sid = stream_vardct_dc(g, fd)
            entries.append((sid, img))
            for i, c in enumerate(img.channel):
                if c.w and c.h:
                    chans.append(c.data)
                    idxs.append(i)
                    sids.append(sid)
        for g, rect, count, img in acmeta_entries:
            sid = stream_ac_metadata(g, fd)
            entries.append((sid, img))
            for i, c in enumerate(img.channel):
                if c.w and c.h:
                    chans.append(c.data)
                    idxs.append(i)
                    sids.append(sid)
        if not chans:
            return None
        tree = learn_tree(chans, idxs, stream_ids=sids, try_wp=True)
        header = GroupHeader()
        header.use_global_tree = True
        streams = {}
        all_tokens = []
        for sid, img in entries:
            live = [i for i, c in enumerate(img.channel) if c.w and c.h]
            if not live:
                continue
            tokens = encode_channels_tokens(img, live, tree,
                                            header.wp_header, sid)
            streams[sid] = tokens
            all_tokens.append(tokens)
        state = {"tree": tree, "streams": streams,
                 "all_tokens": all_tokens, "codes": None}

        # --- exact pick-better: serialize both variants to scratch.
        # Each learned piece goes into its OWN writer so the winning
        # variant's bits are spliced verbatim at real write time
        # (append_bits_lsb) instead of being re-serialized.
        wg = BitWriter()
        self.write_vardct_aux_global(wg, state)
        piece = {}
        bits_a = wg.bits_written
        for sid, _img in entries:
            ws = BitWriter()
            self.write_aux_with_tree(ws, state, sid)
            piece[sid] = (ws.get_bytes(), ws.bits_written)
            bits_a += ws.bits_written
        wb = BitWriter()
        wb.write_bool(False)
        from libjxl_tpu.modular.tree import ac_meta_tree
        from libjxl_tpu.modular.predict import P_WEIGHTED
        for g, img in dc_entries:
            ftree = self._wp_fixed_dc_tree(img, bitdepth)
            self._encode_stream_image(wb, img, P_WEIGHTED, tree=ftree)
        for g, rect, count, img in acmeta_entries:
            self._encode_stream_image(wb, img, P_ZERO,
                                      tree=ac_meta_tree())
        if bits_a >= wb.bits_written:
            return None
        state["cached_global"] = (wg.get_bytes(), wg.bits_written)
        state["cached_streams"] = piece
        return state

    def write_vardct_aux_global(self, w: BitWriter, state: dict) -> None:
        """LfGlobal GlobalModular payload for a VarDCT frame with a
        learned aux tree: has_tree=1, tree, shared histograms. The
        global modular image itself is empty, so nothing follows (the
        decoder early-returns before reading a GroupHeader)."""
        from libjxl_tpu.entropy.codes import build_and_encode_histograms
        cached = state.get("cached_global")
        if cached is not None:
            w.append_bits_lsb(*cached)
            return
        w.write_bool(True)
        encode_tree(state["tree"], w)
        state["codes"] = build_and_encode_histograms(
            num_tree_contexts(state["tree"]), state["all_tokens"], w)

    def write_aux_with_tree(self, w: BitWriter, state: dict,
                            stream_id: int) -> None:
        from libjxl_tpu.entropy.codes import (
            build_and_encode_histograms, write_tokens)
        cached = state.get("cached_streams")
        if cached is not None and stream_id in cached:
            w.append_bits_lsb(*cached[stream_id])
            return
        if state["codes"] is None:
            scratch = BitWriter()
            state["codes"] = build_and_encode_histograms(
                num_tree_contexts(state["tree"]), state["all_tokens"],
                scratch)
        header = GroupHeader()
        header.use_global_tree = True
        bundle_write(header, w)
        write_tokens(state["streams"][stream_id], state["codes"], w)
