"""MA decision trees: nodes, (de)serialization, lookup.

Reference: lib/jxl/modular/encoding/dec_ma.{h,cc} (DecodeTree,
ValidateTree), ma_common.h (the 6 tree token contexts). Trees split on
properties (`properties[p] > splitval` -> left child) and leaves carry
(context id, predictor, offset, multiplier).
"""

from __future__ import annotations

import dataclasses

from libjxl_tpu.base.errors import BitstreamError
from libjxl_tpu.base.signed import pack_signed, unpack_signed
from libjxl_tpu.bitstream.bit_io import BitReader, BitWriter

# ma_common.h:13-21
SPLIT_VAL_CONTEXT = 0
PROPERTY_CONTEXT = 1
PREDICTOR_CONTEXT = 2
OFFSET_CONTEXT = 3
MULTIPLIER_LOG_CONTEXT = 4
MULTIPLIER_BITS_CONTEXT = 5
NUM_TREE_CONTEXTS = 6

MAX_TREE_SIZE = 1 << 22  # ma_common.h kMaxTreeSize
NUM_MODULAR_PREDICTORS = 14

# Property indices (context_predict.h:376-382)
NUM_STATIC_PROPERTIES = 2
NUM_NONREF_PROPERTIES = NUM_STATIC_PROPERTIES + 13 + 1
WP_PROP = NUM_NONREF_PROPERTIES - 1  # 15
GRADIENT_PROP = 9
EXTRA_PROPS_PER_CHANNEL = 4


@dataclasses.dataclass
class TreeNode:
    property: int = -1        # -1 = leaf
    splitval: int = 0
    lchild: int = 0           # for leaves: leaf/context id
    rchild: int = 0
    predictor: int = 0
    predictor_offset: int = 0
    multiplier: int = 1


Tree = list  # list[TreeNode]


def leaf(context_id: int, predictor: int = 0, offset: int = 0,
         multiplier: int = 1) -> TreeNode:
    return TreeNode(-1, 0, context_id, 0, predictor, offset, multiplier)


def num_tree_contexts(tree: Tree) -> int:
    """(tree_size + 1) / 2 leaves."""
    return (len(tree) + 1) // 2


def tree_uses_wp(tree: Tree) -> bool:
    for n in tree:
        if n.property == WP_PROP:
            return True
        if n.property == -1 and n.predictor == 6:  # Predictor::Weighted
            return True
    return False


def tree_num_props(tree: Tree) -> int:
    mx = -1
    for n in tree:
        mx = max(mx, n.property)
    return max(mx + 1, NUM_NONREF_PROPERTIES)


def decode_tree(r: BitReader, tree_size_limit: int = MAX_TREE_SIZE) -> Tree:
    """dec_ma.cc:163-181 + 107-158."""
    from libjxl_tpu.entropy.codes import decode_histograms, SymbolReader

    codes = decode_histograms(r, NUM_TREE_CONTEXTS)
    reader = SymbolReader(codes, r)
    tree: Tree = []
    to_decode = 1
    leaf_id = 0
    limit = min(tree_size_limit, MAX_TREE_SIZE)
    while to_decode > 0:
        if len(tree) > limit:
            raise BitstreamError("tree too large")
        to_decode -= 1
        prop1 = reader.read(PROPERTY_CONTEXT)
        if prop1 > 256:
            raise BitstreamError("invalid tree property")
        prop = prop1 - 1
        if prop == -1:
            predictor = reader.read(PREDICTOR_CONTEXT)
            if predictor >= NUM_MODULAR_PREDICTORS:
                raise BitstreamError("invalid predictor")
            offset = unpack_signed(reader.read(OFFSET_CONTEXT))
            mul_log = reader.read(MULTIPLIER_LOG_CONTEXT)
            if mul_log >= 31:
                raise BitstreamError("invalid multiplier log")
            mul_bits = reader.read(MULTIPLIER_BITS_CONTEXT)
            if mul_bits >= (1 << (31 - mul_log)) - 1:
                raise BitstreamError("invalid multiplier")
            multiplier = (mul_bits + 1) << mul_log
            tree.append(leaf(leaf_id, predictor, offset, multiplier))
            leaf_id += 1
            continue
        splitval = unpack_signed(reader.read(SPLIT_VAL_CONTEXT))
        tree.append(TreeNode(prop, splitval,
                             len(tree) + to_decode + 1,
                             len(tree) + to_decode + 2))
        to_decode += 2
    if not reader.check_final_state():
        raise BitstreamError("bad ANS state after tree")
    validate_tree(tree)
    return tree


def tree_tokens(tree: Tree) -> list:
    """Token stream for a tree (enc_ma.cc TokenizeTree equivalent).

    The tree must be in the breadth-ordered layout produced by
    decode_tree: children of the i-th decision node appear at the
    positions implied by the to_decode counter. We re-serialize by
    walking in the same order the decoder expects.
    """
    from libjxl_tpu.entropy.codes import Token

    tokens = []
    # Emit nodes in stored order; the layout invariant guarantees this
    # matches the decoder's traversal.
    for n in tree:
        if n.property == -1:
            tokens.append(Token(PROPERTY_CONTEXT, 0))
            tokens.append(Token(PREDICTOR_CONTEXT, int(n.predictor)))
            tokens.append(Token(OFFSET_CONTEXT,
                                pack_signed(n.predictor_offset)))
            mul = n.multiplier
            mul_log = 0
            while (mul & 1) == 0:
                mul >>= 1
                mul_log += 1
            tokens.append(Token(MULTIPLIER_LOG_CONTEXT, mul_log))
            tokens.append(Token(MULTIPLIER_BITS_CONTEXT, mul - 1))
        else:
            tokens.append(Token(PROPERTY_CONTEXT, n.property + 1))
            tokens.append(Token(SPLIT_VAL_CONTEXT, pack_signed(n.splitval)))
    return tokens


def encode_tree(tree: Tree, w: BitWriter) -> None:
    from libjxl_tpu.entropy.codes import (
        build_and_encode_histograms, write_tokens)

    tokens = tree_tokens(tree)
    codes = build_and_encode_histograms(NUM_TREE_CONTEXTS, [tokens], w)
    write_tokens(tokens, codes, w)


def validate_tree(tree: Tree) -> None:
    """dec_ma.cc:39-105: splitvals must stay within parent ranges."""
    if not tree:
        return
    INT32_MIN, INT32_MAX = -(1 << 31), (1 << 31) - 1

    num_props = max((n.property for n in tree), default=-1) + 1
    ranges = [[INT32_MIN, INT32_MAX] for _ in range(num_props)]

    def rec(idx: int, depth: int) -> None:
        if depth > 2048:
            raise BitstreamError("tree too tall")
        node = tree[idx]
        if node.property == -1:
            return
        lo, hi = ranges[node.property]
        v = node.splitval
        if lo > v or hi <= v:
            raise BitstreamError("invalid tree split")
        ranges[node.property] = [v + 1, hi]
        rec(node.lchild, depth + 1)
        ranges[node.property] = [lo, v]
        rec(node.rchild, depth + 1)
        ranges[node.property] = [lo, hi]

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(5000)
    try:
        rec(0, 0)
    finally:
        sys.setrecursionlimit(old)


def build_fixed_tree_list(nodes: list[tuple]) -> Tree:
    """Build a tree from (property, splitval) decisions + leaves in the
    breadth-first layout the decoder produces. Input: list where each
    element is either ('leaf', predictor, offset, multiplier) or
    ('split', property, splitval). Must already be in decode order."""
    tree: Tree = []
    leaf_id = 0
    to_decode = 1
    for item in nodes:
        to_decode -= 1
        if item[0] == "leaf":
            _, pred, off, mul = item
            tree.append(leaf(leaf_id, pred, off, mul))
            leaf_id += 1
        else:
            _, prop, sval = item
            tree.append(TreeNode(prop, sval, len(tree) + to_decode + 1,
                                 len(tree) + to_decode + 2))
            to_decode += 2
    assert to_decode == 0
    return tree


def make_fixed_tree(prop: int, cutoffs: list, predictor: int,
                    num_pixels: int, bitdepth: int = 8) -> Tree:
    """MakeFixedTree (enc_encoding.cc:72-102): balanced BFS tree
    splitting one property at sorted `cutoffs`, every leaf using
    `predictor`; depth reduced for small streams; cutoffs scaled for
    deep bit depths. Leaf context ids follow decode (list) order."""
    from collections import deque
    log_px = max(1, (max(num_pixels, 1) - 1).bit_length())
    min_gap = 8 * (14 - log_px) if log_px < 14 else 0
    shift = min(4, bitdepth - 11) if bitdepth > 11 else 0
    mul = 1 << shift
    tree: Tree = [leaf(0, predictor)]
    q = deque([(0, len(cutoffs), 0)])
    while q:
        begin, end, pos = q.popleft()
        if begin + min_gap >= end:
            continue
        split = (begin + end) // 2
        cutoff = cutoffs[split] * mul
        tree[pos] = TreeNode(prop, cutoff, len(tree), len(tree) + 1,
                             0, 0, 1)
        q.append((split + 1, end, len(tree)))
        tree.append(leaf(0, predictor))
        q.append((begin, split, len(tree)))
        tree.append(leaf(0, predictor))
    # Renumber leaf contexts in list (decode) order.
    lid = 0
    for i, n in enumerate(tree):
        if n.property == -1:
            tree[i] = leaf(lid, n.predictor, n.predictor_offset,
                           n.multiplier)
            lid += 1
    return tree


# WP-error cutoffs of the reference's fixed DC tree
# (enc_encoding.cc:543-549 kWPFixedDC).
WP_FIXED_DC_CUTOFFS = [
    -500, -392, -255, -191, -127, -95, -63, -47, -31, -23, -15,
    -11, -7, -4, -3, -1, 0, 1, 3, 5, 7, 11,
    15, 23, 31, 47, 63, 95, 127, 191, 255, 392, 500]


def reorder_bfs(tree: Tree) -> Tree:
    """Reorders an arbitrarily-laid-out tree into the decoder's implied
    breadth-first layout (children of the i-th emitted split follow in
    queue order) and renumbers leaf contexts in list order."""
    from collections import deque
    out: Tree = []
    q = deque([0])
    pos_of = {}
    order = []
    while q:
        i = q.popleft()
        order.append(i)
        pos_of[i] = len(order) - 1
        n = tree[i]
        if n.property >= 0:
            q.append(n.lchild)
            q.append(n.rchild)
    lid = 0
    remap = {old: new for new, old in enumerate(order)}
    for i in order:
        n = tree[i]
        if n.property < 0:
            out.append(leaf(lid, n.predictor, n.predictor_offset,
                            n.multiplier))
            lid += 1
        else:
            out.append(TreeNode(n.property, n.splitval,
                                remap[n.lchild], remap[n.rchild],
                                n.predictor, n.predictor_offset,
                                n.multiplier))
    return out


def ac_meta_tree() -> Tree:
    """The reference's handcrafted AC-metadata tree
    (enc_encoding.cc:500-541 kACMeta): channel splits, gradient CfL,
    left-predicted QF with magnitude contexts, zero-predicted ACS/EPF
    with previous-value contexts."""
    S, L = TreeNode, leaf
    raw = [
        S(0, 1, 1, 2, 0, 0, 1),      # 0: c > 1
        S(0, 2, 3, 4, 0, 0, 1),      # 1: c > 2
        S(0, 0, 5, 6, 0, 0, 1),      # 2: c > 0
        S(6, 3, 21, 22, 0, 0, 1),    # 3: EPF, top > 3
        S(2, 0, 7, 8, 0, 0, 1),      # 4: ACS+QF, y > 0
        L(0, 5), L(0, 5),            # 5, 6: CfL x / b (gradient)
        S(7, 5, 9, 10, 0, 0, 1),     # 7: QF row, left > 5
        S(7, 5, 15, 16, 0, 0, 1),    # 8: ACS row
        S(7, 11, 11, 12, 0, 0, 1),   # 9
        S(7, 3, 13, 14, 0, 0, 1),    # 10
        L(0, 1), L(0, 1), L(0, 1), L(0, 1),   # 11-14: QF (left)
        S(7, 11, 17, 18, 0, 0, 1),   # 15
        S(7, 3, 19, 20, 0, 0, 1),    # 16
        L(0, 0), L(0, 0), L(0, 0), L(0, 0),   # 17-20: ACS (zero)
        S(7, 3, 23, 24, 0, 0, 1),    # 21
        S(7, 3, 25, 26, 0, 0, 1),    # 22
        L(0, 0), L(0, 0), L(0, 0), L(0, 0),   # 23-26: EPF (zero)
    ]
    return reorder_bfs(raw)
