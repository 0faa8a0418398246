"""Modular codec core: GroupHeader, Transform bundles, channel decode
and encode.

Reference: lib/jxl/modular/encoding/encoding.{h,cc} (ModularDecode,
GroupHeader), enc_encoding.cc (ModularGenericCompress),
transform/transform.cc (Transform::VisitFields / MetaApply / Inverse).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.base.signed import pack_signed, unpack_signed
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter
from libjxl_tpu.bitstream.fields import (
    Bits, BitsOffset, U32Enc, Val, Visitor, bundle_read, bundle_write,
)
from libjxl_tpu.modular import transforms as tx
from libjxl_tpu.modular.image import Channel, ModularImage
from libjxl_tpu.modular.predict import (
    P_GRADIENT, P_WEIGHTED, P_ZERO, WPHeader, WPState, clamped_gradient,
    neighbors, precompute_references, predict_one,
)
from libjxl_tpu.modular.tree import (
    NUM_NONREF_PROPERTIES, NUM_STATIC_PROPERTIES, Tree, WP_PROP, decode_tree,
    encode_tree, leaf, num_tree_contexts, tree_num_props, tree_uses_wp,
)


class TransformId:
    RCT = 0
    PALETTE = 1
    SQUEEZE = 2
    INVALID = 3


@dataclasses.dataclass
class SqueezeParams:
    """squeeze_params.cc:15-24."""
    horizontal: bool = False
    in_place: bool = False
    begin_c: int = 0
    num_c: int = 2

    _BEGIN_ENC = U32Enc(Bits(3), BitsOffset(6, 8), BitsOffset(10, 72),
                        BitsOffset(13, 1096))
    _NUM_ENC = U32Enc(Val(1), Val(2), Val(3), BitsOffset(4, 4))

    def visit_fields(self, v: Visitor) -> None:
        self.horizontal = v.bool_(False, self.horizontal)
        self.in_place = v.bool_(False, self.in_place)
        self.begin_c = v.u32(self._BEGIN_ENC, 0, self.begin_c)
        self.num_c = v.u32(self._NUM_ENC, 2, self.num_c)


@dataclasses.dataclass
class Transform:
    """transform.cc:36-89."""
    id: int = TransformId.RCT
    begin_c: int = 0
    rct_type: int = 6
    num_c: int = 3
    nb_colors: int = 256
    nb_deltas: int = 0
    predictor: int = P_ZERO
    squeezes: list = dataclasses.field(default_factory=list)

    _BEGIN_ENC = U32Enc(Bits(3), BitsOffset(6, 8), BitsOffset(10, 72),
                        BitsOffset(13, 1096))

    def visit_fields(self, v: Visitor) -> None:
        self.id = v.u32(U32Enc(Val(0), Val(1), Val(2), Val(3)),
                        TransformId.RCT, self.id)
        if self.id == TransformId.INVALID:
            raise BitstreamError("invalid transform id")
        if v.conditional(self.id in (TransformId.RCT, TransformId.PALETTE)):
            self.begin_c = v.u32(self._BEGIN_ENC, 0, self.begin_c)
        if v.conditional(self.id == TransformId.RCT):
            self.rct_type = v.u32(
                U32Enc(Val(6), Bits(2), BitsOffset(4, 2), BitsOffset(6, 10)),
                6, self.rct_type)
            if self.rct_type >= 42:
                raise BitstreamError("invalid RCT type")
        if v.conditional(self.id == TransformId.PALETTE):
            self.num_c = v.u32(U32Enc(Val(1), Val(3), Val(4),
                                      BitsOffset(13, 1)), 3, self.num_c)
            self.nb_colors = v.u32(
                U32Enc(BitsOffset(8, 0), BitsOffset(10, 256),
                       BitsOffset(12, 1280), BitsOffset(16, 5376)),
                256, self.nb_colors)
            self.nb_deltas = v.u32(
                U32Enc(Val(0), BitsOffset(8, 1), BitsOffset(10, 257),
                       BitsOffset(16, 1281)), 0, self.nb_deltas)
            self.predictor = v.bits(4, P_ZERO, self.predictor)
            if self.predictor >= 14:
                raise BitstreamError("invalid palette predictor")
        if v.conditional(self.id == TransformId.SQUEEZE):
            num = v.u32(U32Enc(Val(0), BitsOffset(4, 1), BitsOffset(6, 9),
                               BitsOffset(8, 41)), 0, len(self.squeezes))
            if v.reading:
                self.squeezes = [SqueezeParams() for _ in range(num)]
            for s in self.squeezes:
                v.visit_nested(s)

    def meta_apply(self, image: ModularImage) -> None:
        """transform.cc MetaApply: geometry-only application."""
        if self.id == TransformId.RCT:
            if self.begin_c + 2 >= len(image.channel):
                raise BitstreamError("RCT channel range out of bounds")
        elif self.id == TransformId.PALETTE:
            end_c = self.begin_c + self.num_c - 1
            if end_c >= len(image.channel):
                raise BitstreamError("palette channel range out of bounds")
            for c in range(self.begin_c + 1, end_c + 1):
                a, b = image.channel[self.begin_c], image.channel[c]
                if a.w != b.w or a.h != b.h:
                    raise BitstreamError("palette channels differ in size")
            tx.meta_palette(image, self.begin_c, end_c, self.nb_colors,
                            self.nb_deltas)
        elif self.id == TransformId.SQUEEZE:
            tx.meta_squeeze(image, self.squeezes)

    def inverse(self, image: ModularImage, wp_header: WPHeader) -> None:
        if self.id == TransformId.RCT:
            tx.inv_rct(image, self.begin_c, self.rct_type)
        elif self.id == TransformId.PALETTE:
            tx.inv_palette(image, self.begin_c, self.nb_colors,
                           self.nb_deltas, self.predictor, wp_header)
        elif self.id == TransformId.SQUEEZE:
            tx.inv_squeeze(image, self.squeezes)


@dataclasses.dataclass
class GroupHeader:
    """encoding.h:32-55."""
    use_global_tree: bool = False
    wp_header: WPHeader = dataclasses.field(default_factory=WPHeader)
    transforms: list = dataclasses.field(default_factory=list)

    def visit_fields(self, v: Visitor) -> None:
        self.use_global_tree = v.bool_(False, self.use_global_tree)
        v.visit_nested(self.wp_header)
        num = v.u32(U32Enc(Val(0), Val(1), BitsOffset(4, 2),
                           BitsOffset(8, 18)), 0, len(self.transforms))
        if v.reading:
            self.transforms = [Transform() for _ in range(num)]
        for t in self.transforms:
            v.visit_nested(t)


# ---------------------------------------------------------------------------
# Tree evaluation helpers


def _lookup_tree(tree: Tree, props: list) -> tuple:
    """Returns (context, predictor, offset, multiplier).
    Split rule: properties[p] > splitval -> lchild (encoding.cc:75-79)."""
    pos = 0
    while True:
        node = tree[pos]
        if node.property == -1:
            return node.lchild, node.predictor, node.predictor_offset, \
                node.multiplier
        pos = node.lchild if props[node.property] > node.splitval \
            else node.rchild


def _decode_channel(reader, tree: Tree, wp_header: WPHeader,
                    image: ModularImage, chan_idx: int, group_id: int,
                    context_offset: int = 0) -> None:
    """DecodeModularChannelMAANS slow track (encoding.cc:149-527)."""
    ch = image.channel[chan_idx]
    w, h = ch.w, ch.h
    if w == 0 or h == 0:
        return
    data = ch.data
    num_props = tree_num_props(tree)
    use_wp = tree_uses_wp(tree)
    num_ref_props = num_props - NUM_NONREF_PROPERTIES

    # Single-leaf fast paths.
    if len(tree) == 1:
        node = tree[0]
        ctx = node.lchild
        if node.predictor == P_ZERO:
            vals = np.empty(w * h, np.int64)
            flat = vals
            for i in range(w * h):
                flat[i] = reader.read(ctx)
            residual = np.where(flat & 1 == 0, flat >> 1, -((flat + 1) >> 1))
            data[:, :] = (residual.reshape(h, w) * node.multiplier
                          + node.predictor_offset).astype(np.int32)
            return
        if node.predictor == P_GRADIENT and node.predictor_offset == 0 \
                and node.multiplier == 1:
            for y in range(h):
                for x in range(w):
                    left = int(data[y, x - 1]) if x else \
                        (int(data[y - 1, x]) if y else 0)
                    top = int(data[y - 1, x]) if y else left
                    topleft = int(data[y - 1, x - 1]) if (x and y) else left
                    guess = clamped_gradient(top, left, topleft)
                    v = reader.read(ctx)
                    data[y, x] = unpack_signed(v) + guess
            return

    props = [0] * num_props
    props[0] = chan_idx
    props[1] = group_id
    wp_state = WPState(wp_header, w) if use_wp else None
    for y in range(h):
        props[2] = y
        props[9] = 0  # local gradient of previous pixel (InitPropsRow)
        refs = precompute_references(image, chan_idx, y, num_ref_props) \
            if num_ref_props > 0 else None
        for x in range(w):
            left, top, topleft, topright, leftleft, toptop, trr = \
                neighbors(data, x, y, w)
            props[3] = x
            props[4] = abs(top)
            props[5] = abs(left)
            props[6] = top
            props[7] = left
            props[8] = left - props[9]
            props[9] = left + top - topleft
            props[10] = left - topleft
            props[11] = topleft - top
            props[12] = top - topright
            props[13] = top - toptop
            props[14] = left - leftleft
            if wp_state is not None:
                wp_pred, max_err = wp_state.predict(x, y, top, left,
                                                    topright, topleft, toptop)
                props[WP_PROP] = max_err
            else:
                wp_pred = 0
                if num_props > WP_PROP:
                    props[WP_PROP] = 0
            if refs is not None:
                for i in range(num_ref_props):
                    props[NUM_NONREF_PROPERTIES + i] = int(refs[i, x])
            ctx, predictor, offset, multiplier = _lookup_tree(tree, props)
            guess = predict_one(predictor, left, top, toptop, topleft,
                                topright, leftleft, trr, wp_pred) + offset
            v = reader.read(context_offset + ctx)
            val = unpack_signed(v) * multiplier + guess
            data[y, x] = val
            if wp_state is not None:
                wp_state.update_errors(int(data[y, x]), x, y)


def _encode_channel(tree: Tree, wp_header: WPHeader, image: ModularImage,
                    chan_idx: int, group_id: int, tokens: list,
                    context_offset: int = 0) -> None:
    """Mirror of _decode_channel producing tokens."""
    from libjxl_tpu.entropy.codes import Token

    ch = image.channel[chan_idx]
    w, h = ch.w, ch.h
    if w == 0 or h == 0:
        return
    data = ch.data
    num_props = tree_num_props(tree)
    use_wp = tree_uses_wp(tree)
    num_ref_props = num_props - NUM_NONREF_PROPERTIES

    if len(tree) == 1 and tree[0].predictor == P_ZERO:
        node = tree[0]
        ctx = context_offset + node.lchild
        flat = data.astype(np.int64).ravel()
        residual = (flat - node.predictor_offset)
        if node.multiplier != 1:
            if np.any(residual % node.multiplier):
                raise BitstreamError("values not divisible by multiplier")
            residual //= node.multiplier
        packed = np.where(residual >= 0, 2 * residual, -2 * residual - 1)
        for v in packed:
            tokens.append(Token(ctx, int(v)))
        return

    props = [0] * num_props
    props[0] = chan_idx
    props[1] = group_id
    wp_state = WPState(wp_header, w) if use_wp else None
    for y in range(h):
        props[2] = y
        props[9] = 0
        refs = precompute_references(image, chan_idx, y, num_ref_props) \
            if num_ref_props > 0 else None
        for x in range(w):
            left, top, topleft, topright, leftleft, toptop, trr = \
                neighbors(data, x, y, w)
            props[3] = x
            props[4] = abs(top)
            props[5] = abs(left)
            props[6] = top
            props[7] = left
            props[8] = left - props[9]
            props[9] = left + top - topleft
            props[10] = left - topleft
            props[11] = topleft - top
            props[12] = top - topright
            props[13] = top - toptop
            props[14] = left - leftleft
            if wp_state is not None:
                wp_pred, max_err = wp_state.predict(x, y, top, left,
                                                    topright, topleft, toptop)
                props[WP_PROP] = max_err
            else:
                wp_pred = 0
                if num_props > WP_PROP:
                    props[WP_PROP] = 0
            if refs is not None:
                for i in range(num_ref_props):
                    props[NUM_NONREF_PROPERTIES + i] = int(refs[i, x])
            ctx, predictor, offset, multiplier = _lookup_tree(tree, props)
            guess = predict_one(predictor, left, top, toptop, topleft,
                                topright, leftleft, trr, wp_pred) + offset
            val = int(data[y, x])
            residual = val - guess
            if multiplier != 1:
                if residual % multiplier:
                    raise BitstreamError("residual not divisible")
                residual //= multiplier
            tokens.append(Token(context_offset + ctx, pack_signed(residual)))
            if wp_state is not None:
                wp_state.update_errors(val, x, y)


def encode_channels_tokens(image: ModularImage, chan_indices, tree,
                           wp_header: WPHeader, group_id: int):
    """Tokenize channels -> (ctx, value) arrays; native when possible."""
    try:
        from libjxl_tpu.native.bindings import (
            available, make_channel_descs, make_tree_array, make_wp_header)
    except Exception:
        available = lambda: False  # noqa: E731
    total = sum(image.channel[i].w * image.channel[i].h
                for i in chan_indices)
    if available() and total > 0:
        import ctypes as Ct
        from libjxl_tpu.native.bindings import get_lib
        lib = get_lib()
        buffers = [np.ascontiguousarray(ch.data) for ch in image.channel]
        descs = make_channel_descs(image.channel, buffers)
        tree_arr = make_tree_array(tree)
        wp_hdr = make_wp_header(wp_header)
        out_ctx = np.empty(total, np.int32)
        out_val = np.empty(total, np.uint32)
        pos = 0
        ok = True
        for i in chan_indices:
            n = image.channel[i].w * image.channel[i].h
            if n == 0:
                continue
            rc = lib.mod_encode_channel(
                descs, len(image.channel), i, group_id, tree_arr,
                len(tree), Ct.byref(wp_hdr),
                out_ctx[pos:].ctypes.data_as(Ct.POINTER(Ct.c_int32)),
                out_val[pos:].ctypes.data_as(Ct.POINTER(Ct.c_uint32)),
                total - pos)
            if rc < 0:
                ok = False
                break
            pos += rc
        if ok:
            return out_ctx[:pos], out_val[:pos]
    tokens: list = []
    for i in chan_indices:
        _encode_channel(tree, wp_header, image, i, group_id, tokens)
    ctx = np.fromiter((t.context for t in tokens), np.int32, len(tokens))
    val = np.fromiter((t.value for t in tokens), np.uint32, len(tokens))
    return ctx, val


# ---------------------------------------------------------------------------
# Native fast path


def _native_decode_channels(r, codes, tree, wp_header, image, to_decode,
                            group_id, distance_multiplier) -> bool:
    """Decode all channels with the C++ loops; returns False to fall
    back to Python when the native lib is unavailable (ANS and
    prefix-code streams both decode natively)."""
    try:
        from libjxl_tpu.native.bindings import (
            NativeModularDecoder, available, make_channel_descs,
            make_tree_array, make_wp_header)
    except Exception:
        return False
    if not available():
        return False
    buffers = [np.ascontiguousarray(ch.data) for ch in image.channel]
    descs = make_channel_descs(image.channel, buffers)
    tree_arr = make_tree_array(tree)
    wp_hdr = make_wp_header(wp_header)
    dec = NativeModularDecoder(r.raw_data, r.bits_consumed, codes,
                               distance_multiplier)
    try:
        for i in to_decode:
            rc = dec.decode_channel(descs, len(image.channel), i, group_id,
                                    tree_arr, len(tree), wp_hdr)
            if rc != 0:
                raise BitstreamError("native modular decode failed")
        if not dec.check_final():
            raise BitstreamError("bad ANS state after modular image")
        r.seek_bits(dec.bit_pos())
    finally:
        dec.close()
    for ch, buf in zip(image.channel, buffers):
        ch.data = buf
    return True


# ---------------------------------------------------------------------------
# Top-level decode / encode


def modular_decode(r: BitReader, image: ModularImage, group_id: int = 0,
                   *, global_tree: Tree | None = None,
                   global_codes=None,
                   header: GroupHeader | None = None,
                   undo_transforms: bool = True,
                   max_chan_size: int = 0xFFFFFF) -> GroupHeader:
    """ModularDecode + ModularGenericDecompress (encoding.cc:556-727)."""
    from libjxl_tpu.entropy.codes import decode_histograms, SymbolReader

    if header is None:
        header = GroupHeader()
    if not image.channel:
        return header
    bundle_read(r, header)
    for t in header.transforms:
        t.meta_apply(image)

    # Decide which channels get decoded.
    to_decode = []
    distance_multiplier = 0
    for i, ch in enumerate(image.channel):
        if i >= image.nb_meta_channels and \
                (ch.w > max_chan_size or ch.h > max_chan_size):
            break
        if ch.w == 0 or ch.h == 0:
            continue
        distance_multiplier = max(distance_multiplier, ch.w)
        to_decode.append(i)
    if to_decode:
        if not header.use_global_tree:
            max_tree_size = min(1 << 20, 1024 + sum(
                image.channel[i].w * image.channel[i].h for i in to_decode))
            tree = decode_tree(r, max_tree_size)
            codes = decode_histograms(r, num_tree_contexts(tree))
        else:
            if global_tree is None or global_codes is None:
                raise BitstreamError("global tree requested but unavailable")
            tree = global_tree
            codes = global_codes
        if _native_decode_channels(r, codes, tree, header.wp_header, image,
                                   to_decode, group_id,
                                   distance_multiplier):
            pass  # decoded natively, reader advanced
        else:
            reader = SymbolReader(codes, r, distance_multiplier)
            for i in to_decode:
                _decode_channel(reader, tree, header.wp_header, image, i,
                                group_id)
            if not reader.check_final_state():
                raise BitstreamError("bad ANS state after modular image")
    if undo_transforms:
        for t in reversed(header.transforms):
            t.inverse(image, header.wp_header)
    return header


def modular_encode(image: ModularImage, w: BitWriter, group_id: int = 0,
                   *, transforms: list | None = None,
                   tree: Tree | None = None,
                   predictor: int = P_GRADIENT,
                   max_chan_size: int = 0xFFFFFF) -> None:
    """ModularGenericCompress with a fixed or provided tree.

    Applies `transforms` (forward) to a working copy, writes the group
    header, local tree, histograms and token streams.
    """
    from libjxl_tpu.entropy.codes import build_and_encode_histograms, \
        write_tokens

    header = GroupHeader()
    header.transforms = transforms or []
    work = image.clone()
    for t in header.transforms:
        _apply_forward_transform(work, t)

    if tree is None:
        tree = [leaf(0, predictor, 0, 1)]

    bundle_write(header, w)

    to_encode = []
    for i, ch in enumerate(work.channel):
        if i >= work.nb_meta_channels and \
                (ch.w > max_chan_size or ch.h > max_chan_size):
            break
        if ch.w == 0 or ch.h == 0:
            continue
        to_encode.append(i)
    if not to_encode:
        return
    encode_tree(tree, w)
    tokens: list = []
    for i in to_encode:
        _encode_channel(tree, header.wp_header, work, i, group_id, tokens)
    codes = build_and_encode_histograms(num_tree_contexts(tree), [tokens], w)
    write_tokens(tokens, codes, w)


def _apply_forward_transform(image: ModularImage, t: Transform) -> None:
    """enc_transform.cc TransformForward."""
    if t.id == TransformId.RCT:
        tx.fwd_rct(image, t.begin_c, t.rct_type)
    elif t.id == TransformId.SQUEEZE:
        tx.fwd_squeeze(image, t.squeezes)
    elif t.id == TransformId.PALETTE:
        nb_colors, nb_deltas = tx.fwd_palette(image, t.begin_c, t.num_c)
        t.nb_colors = nb_colors
        t.nb_deltas = nb_deltas
