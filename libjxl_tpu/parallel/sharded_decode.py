"""Multi-chip sharded decode: the real TPU pipeline over a device mesh.

Sharding plan (SURVEY.md §2.11 / §5.8):
  * ``batch``  — data parallel over images (embarrassingly parallel)
  * ``space``  — the image width axis; elementwise/matmul stages are
    local, the loop-filter stencils exchange an 8-pixel halo over ICI
    via ``jax.lax.ppermute`` (the TPU-native replacement for libjxl's
    row-streaming border buffers, low_memory_render_pipeline.cc).

The 8-pixel halo covers the cumulative stencil radius of
gaborish(1) + EPF0(3) + EPF1(2) + EPF2(1) = 7 and keeps the 8x8 block
alignment of the EPF sigma map and border-SAD pattern intact.

Big/rect ACS blocks are supported when the width shards align to
256-px group boundaries: VarDCT blocks never cross group borders
(frame_dimensions.h), so every block's gather/scatter stays local to
its owning shard; blocks are partitioned per shard on the host.
"""

from __future__ import annotations

import numpy as np


def _mods():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _halo_exchange_w(x, halo: int, axis: str, nshards: int):
    """Extend the local W axis with neighbours' edges (mirror at the
    global image boundary, matching symmetric padding)."""
    jax, jnp = _mods()
    if nshards == 1:
        return jnp.concatenate(
            [x[..., :halo][..., ::-1], x, x[..., -halo:][..., ::-1]],
            axis=-1)
    fwd = [(i, (i + 1) % nshards) for i in range(nshards)]
    bwd = [((i + 1) % nshards, i) for i in range(nshards)]
    from_left = jax.lax.ppermute(x[..., -halo:], axis, fwd)
    from_right = jax.lax.ppermute(x[..., :halo], axis, bwd)
    idx = jax.lax.axis_index(axis)
    mirror_l = x[..., :halo][..., ::-1]
    mirror_r = x[..., -halo:][..., ::-1]
    left = jnp.where(idx == 0, mirror_l, from_left)
    right = jnp.where(idx == nshards - 1, mirror_r, from_right)
    return jnp.concatenate([left, x, right], axis=-1)


def make_sharded_decode(mesh, image_h: int, image_w: int,
                        epf_iters: int = 1, gab: bool = True,
                        big_keys: tuple = ()):
    """Builds the sharded decode step over ``mesh`` with axes
    ('batch', 'space'). Inputs are whole-frame feed tensors with a
    leading batch axis; W must divide evenly by 8 * space-shards (and
    by 256 * space-shards when big-ACS classes are present).
    Returns (fn, in_shardings) for jax.jit."""
    jax, jnp = _mods()
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from libjxl_tpu.ops.filters_tpu import apply_loop_filters_tpu
    from libjxl_tpu.ops.decode_tpu import xyb_to_srgb8
    from libjxl_tpu.tpu.feed import big_idct_matrices

    nspace = mesh.shape["space"]
    halo = 8
    if image_w % 8:
        raise ValueError("sharded decode requires image_w % 8 == 0 "
                         "(the W axis is sharded; right-edge block "
                         "padding would be filtered as real pixels)")

    def local_step(coeff, weight, llf, fx, fb, mat_bank, mat_ids,
                   biases, inv_sigma, *big_flat):
        # shapes (B_local, 3, H, W_local) etc.
        B, _, H, Wl = coeff.shape
        BH, BWl = H // 8, Wl // 8
        x = coeff.astype(jnp.float32)
        b = jnp.asarray(biases, jnp.float32)
        bias_c = b[:3].reshape(1, 3, 1, 1)
        general = x - b[3] / jnp.where(x == 0, 1.0, x)
        biased = jnp.where(x == 0, 0.0,
                           jnp.where(x == 1, bias_c,
                                     jnp.where(x == -1, -bias_c, general)))
        dq = biased * weight
        fxc = jnp.repeat(jnp.repeat(fx, 8, 1), 8, 2)
        fbc = jnp.repeat(jnp.repeat(fb, 8, 1), 8, 2)
        dq = jnp.stack([dq[:, 0] + fxc * dq[:, 1],
                        dq[:, 1],
                        dq[:, 2] + fbc * dq[:, 1]], axis=1)
        dq = dq + llf
        # 8x8-family IDCT: masked matmuls (local — cells independent).
        cells = dq.reshape(B, 3, BH, 8, BWl, 8).transpose(0, 1, 2, 4, 3, 5) \
            .reshape(B, 3, BH * BWl, 64)
        ids = mat_ids.reshape(B, BH * BWl)
        hi = jax.lax.Precision.HIGHEST
        pix_cells = jnp.zeros_like(cells)
        for slot in range(mat_bank.shape[0]):
            mask = (ids == slot).astype(jnp.float32)[:, None, :, None]
            pix_cells = pix_cells + jnp.matmul(
                cells * mask, mat_bank[slot], precision=hi)
        pix = pix_cells.reshape(B, 3, BH, BWl, 8, 8) \
            .transpose(0, 1, 2, 4, 3, 5).reshape(B, 3, H, Wl)

        # Big/rect blocks: shard-local gathers (group-aligned shards),
        # masked scatters so capacity padding is a no-op.
        if big_keys:
            flat_dq = dq.reshape(B, 3, H * Wl)
            flat_pix = pix.reshape(B, 3, H * Wl)
            for i, (cy, cx) in enumerate(big_keys):
                in_idx = big_flat[3 * i][:, 0]     # (B, cap, ly8, lx8)
                out_idx = big_flat[3 * i + 1][:, 0]
                mask = big_flat[3 * i + 2][:, 0]   # (B, cap)
                ih, iw = big_idct_matrices(cy, cx)

                def one(fdq, fpix, ii, oi, mk):
                    grids = fdq[:, ii]             # (3, cap, ly8, lx8)
                    if cy >= cx:
                        grids = grids.transpose(0, 1, 3, 2)
                    blk = jnp.einsum(
                        "yu,cnuv,wv->cnyw", jnp.asarray(ih), grids,
                        jnp.asarray(iw),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
                    base = fpix[:, oi]
                    # Masked scatter-ADD: capacity-padding entries (all
                    # pointing at index 0) contribute exactly zero, so
                    # duplicate indices stay deterministic.
                    delta = (blk - base) * mk[None, :, None, None]
                    return fpix.at[:, oi].add(delta)
                flat_pix = jax.vmap(one)(flat_dq, flat_pix, in_idx,
                                         out_idx, mask)
            pix = flat_pix.reshape(B, 3, H, Wl)

        # Crop bottom block padding BEFORE filtering (H is unsharded):
        # the loop filters mirror at the image boundary, not the padded
        # buffer edge (decode_frame_device does the same crop).
        pix = pix[:, :, :image_h]
        if gab or epf_iters > 0:
            # Halo exchange over ICI, then filter and crop the halo.
            ext = _halo_exchange_w(pix, halo, "space", nspace)
            sig_ext = _halo_exchange_w(inv_sigma, 1, "space", nspace)

            def one(img, sig):
                return apply_loop_filters_tpu(
                    img, sig, epf_iters=epf_iters, gab=gab)
            out = jax.vmap(one)(ext, sig_ext)
            pix = out[..., halo:-halo]
        return xyb_to_srgb8(pix)

    spec_img = P("batch", None, None, "space")
    spec_blk = P("batch", None, "space")
    spec_big = P("batch", "space")
    in_specs = [spec_img, spec_img, spec_img, spec_blk, spec_blk,
                P(), spec_blk, P(), spec_blk]
    in_specs += [spec_big] * (3 * len(big_keys))
    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=spec_img,
        check_rep=False)
    jitted = jax.jit(fn)
    shardings = tuple(NamedSharding(mesh, s) for s in in_specs)
    return jitted, shardings


def batch_feeds(feeds: list, nspace: int) -> tuple:
    """Stack per-image feeds (equal shapes) into the batched tensors for
    the sharded step, partitioning big-ACS blocks per owning width
    shard (shards must align to 256-px group boundaries).

    Returns (args, big_keys): args feed make_sharded_decode's jitted fn
    in order; big entries are (B, S, cap, ...) index/mask tensors with
    LOCAL flat indices."""
    from libjxl_tpu.tpu.feed import family8_matrices

    coeff = np.stack([f["coeff_img"] for f in feeds])
    weight = np.stack([f["weight_img"] for f in feeds])
    llf = np.stack([f["llf_img"] for f in feeds])
    fx = np.stack([f["fx"] for f in feeds])
    fb = np.stack([f["fb"] for f in feeds])
    ids = np.stack([f["mat_ids"] for f in feeds])
    B = len(feeds)
    _, H, W = feeds[0]["coeff_img"].shape
    if W % nspace:
        raise ValueError("W must divide by the space shards")
    Wl = W // nspace

    big_keys = tuple(sorted({k for f in feeds for k in f["big"]}))
    big_args = []
    for key in big_keys:
        (cy, cx) = key
        per = np.zeros((B, nspace), np.int64)
        entries: dict = {}
        for b, f in enumerate(feeds):
            if key not in f["big"]:
                continue
            in_idx, out_idx, mask = f["big"][key]
            n = int(mask.sum())
            for i in range(n):
                gx = int(in_idx[i].min() % W)
                shard = gx // Wl
                if (gx + cx * 8) > (shard + 1) * Wl:
                    raise ValueError("big block crosses a width shard; "
                                     "align shards to group boundaries")
                # globally flat -> locally flat index conversion
                def to_local(idx):
                    y = idx // W
                    x = idx % W - shard * Wl
                    return y * Wl + x
                entries.setdefault((b, shard), []).append(
                    (to_local(in_idx[i]), to_local(out_idx[i])))
                per[b, shard] += 1
        cap = max(1, int(per.max()))
        ly, lx = in_idx.shape[1] // 8, in_idx.shape[2] // 8
        iin = np.zeros((B, nspace, cap) + in_idx.shape[1:], np.int64)
        iout = np.zeros((B, nspace, cap) + out_idx.shape[1:], np.int64)
        imask = np.zeros((B, nspace, cap), np.float32)
        for (b, shard), lst in entries.items():
            for i, (li, lo) in enumerate(lst):
                iin[b, shard, i] = li
                iout[b, shard, i] = lo
                imask[b, shard, i] = 1.0
        big_args.extend([iin, iout, imask])

    for f in feeds[1:]:
        if not np.array_equal(f["biases"], feeds[0]["biases"]):
            raise ValueError("batched feeds use different quant biases")
    args = (coeff, weight, llf, fx, fb, family8_matrices(), ids,
            feeds[0]["biases"])
    return args, big_keys, tuple(big_args)


# ---------------------------------------------------------------------------
# Slim-feed (v2) sharded decode: int16 coefficients + control maps on
# the wire; dequant weights, CfL and LLF are reconstructed ON DEVICE
# (~6 bytes/pixel host->device and DCN->ICI instead of ~40).


def make_sharded_decode2(mesh, image_h: int, image_w: int,
                         epf_iters: int = 1, gab: bool = True,
                         class_keys: tuple = ()):
    """Builds the slim-feed sharded decode step over ``mesh``
    ('batch', 'space'). Per-image inputs (leading batch axis): int16
    coeff_img, mat_ids/raw_quant/dc/fx/fb block maps, per-image
    inv_global_scale + qmul, replicated table banks; big-ACS classes as
    per-shard (B, S, cap) LOCAL anchor-block indices + masks
    (batch_feeds2). Returns (jitted_fn, in_shardings)."""
    jax, jnp = _mods()
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from libjxl_tpu.ops.decode_tpu import xyb_to_srgb8
    from libjxl_tpu.ops.filters_tpu import apply_loop_filters_tpu
    from libjxl_tpu.tpu.pipeline import decode_xyb2

    nspace = mesh.shape["space"]
    halo = 8
    if image_w % 8:
        raise ValueError("sharded decode requires image_w % 8 == 0 "
                         "(the W axis is sharded; right-edge block "
                         "padding would be filtered as real pixels)")
    BWl = (image_w // nspace) // 8

    def local_step(coeff, ids, rq, dc, fx, fb, inv_gs, qmul, inv_sigma,
                   tables8, mat_bank, biases, *flat):
        ntab = len(class_keys)
        big_tables = {k: flat[i] for i, k in enumerate(class_keys)}

        def one(c1, i1, r1, d1, f1, g1, gs1, qm1, *cls1):
            classes = {k: (cls1[2 * j], cls1[2 * j + 1])
                       for j, k in enumerate(class_keys)}
            return decode_xyb2(c1, i1, r1, d1, f1, g1, gs1, qm1,
                               tables8, mat_bank, big_tables, classes,
                               biases, BWl)

        cls_args = []
        for j in range(len(class_keys)):
            cls_args.append(flat[ntab + 2 * j][:, 0])   # (B, cap)
            cls_args.append(flat[ntab + 2 * j + 1][:, 0])
        pix = jax.vmap(one)(coeff, ids, rq, dc, fx, fb, inv_gs, qmul,
                            *cls_args)
        # Crop bottom block padding before filtering (H is unsharded).
        pix = pix[:, :, :image_h]
        if gab or epf_iters > 0:
            ext = _halo_exchange_w(pix, halo, "space", nspace)
            sig_ext = _halo_exchange_w(inv_sigma, 1, "space", nspace)

            def filt(img, sig):
                return apply_loop_filters_tpu(
                    img, sig, epf_iters=epf_iters, gab=gab)
            pix = jax.vmap(filt)(ext, sig_ext)[..., halo:-halo]
        return xyb_to_srgb8(pix)

    spec_img = P("batch", None, None, "space")
    spec_blk = P("batch", None, "space")
    spec_blk3 = P("batch", None, None, "space")
    spec_b = P("batch")
    spec_big = P("batch", "space")
    in_specs = [spec_img, spec_blk, spec_blk, spec_blk3, spec_blk,
                spec_blk, spec_b, P(), spec_blk, P(), P(), P()]
    in_specs[7] = P("batch", None)      # qmul per image (B, 3)
    in_specs += [P()] * len(class_keys)            # big tables
    in_specs += [spec_big] * (2 * len(class_keys))  # anchors + masks
    fn = shard_map(local_step, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=P("batch", None, None, "space"),
                   check_rep=False)
    jitted = jax.jit(fn)
    shardings = tuple(NamedSharding(mesh, s) for s in in_specs)
    return jitted, shardings


def batch_feeds2(feeds: list, nspace: int) -> tuple:
    """Stack slim (v2) per-image feeds into the batched tensors for
    make_sharded_decode2, partitioning big-ACS anchors per owning width
    shard (group-aligned shards; LOCAL block indices).

    Returns (args, class_keys): args in jitted-fn order."""
    from libjxl_tpu.tpu.feed import FAMILY8, family8_matrices

    B = len(feeds)
    _, H, W = feeds[0]["coeff_img"].shape
    if W % (8 * nspace):
        raise ValueError("W must divide by 8 * space shards")
    BW = W // 8
    BWl = BW // nspace
    from libjxl_tpu.tpu.feed import dense_coeff
    coeff = np.stack([np.asarray(dense_coeff(f), np.int16)
                      for f in feeds])
    ids = np.stack([f["mat_ids"] for f in feeds])
    rq = np.stack([f["raw_quant"] for f in feeds])
    dc = np.stack([f["dc"] for f in feeds])
    fx = np.stack([f["fx"] for f in feeds])
    fb = np.stack([f["fb"] for f in feeds])
    inv_gs = np.array([f["inv_gs"] for f in feeds], np.float32)
    qmul = np.stack([f["qmul"] for f in feeds])
    inv_sigma = np.stack([f["inv_sigma"] for f in feeds])
    tables8 = feeds[0]["tables8"]
    biases = feeds[0]["biases"]
    # Quant-weight tables ride replicated (not per image): a batch
    # mixing custom frame-level DequantMatrices would silently decode
    # with the wrong tables — reject it instead.
    for f in feeds[1:]:
        if not (np.array_equal(f["tables8"], tables8)
                and np.array_equal(f["biases"], biases)):
            raise ValueError(
                "batched feeds use different dequant tables/biases; "
                "batch only frames sharing DequantMatrices")

    class_keys = tuple(sorted({k for f in feeds for k in f["classes"]}))
    big_tables = []
    for key in class_keys:
        tabs = [f["big_tables"][key] for f in feeds
                if key in f["big_tables"]]
        if any(not np.array_equal(t, tabs[0]) for t in tabs[1:]):
            raise ValueError(
                f"batched feeds use different dequant tables for "
                f"strategy class {key}; batch only frames sharing "
                f"DequantMatrices")
        big_tables.append(tabs[0])
    cls_args = []
    for key in class_keys:
        cy, cx = key
        entries: dict = {}
        per = np.zeros((B, nspace), np.int64)
        for b, f in enumerate(feeds):
            if key not in f["classes"]:
                continue
            anchor_idx, mask = f["classes"][key]
            for i in range(len(anchor_idx)):
                if mask[i] == 0:
                    continue
                a = int(anchor_idx[i])
                aby, abx = divmod(a, BW)
                shard = abx // BWl
                if abx + cx > (shard + 1) * BWl:
                    raise ValueError("big block crosses a width shard")
                local = aby * BWl + (abx - shard * BWl)
                entries.setdefault((b, shard), []).append(local)
                per[b, shard] += 1
        cap = max(1, int(per.max()))
        aidx = np.zeros((B, nspace, cap), np.int32)
        amask = np.zeros((B, nspace, cap), np.float32)
        for (b, shard), lst in entries.items():
            for i, a in enumerate(lst):
                aidx[b, shard, i] = a
                amask[b, shard, i] = 1.0
        cls_args.extend([aidx, amask])

    args = (coeff, ids, rq, dc, fx, fb, inv_gs, qmul, inv_sigma,
            tables8, family8_matrices(), biases,
            *big_tables, *cls_args)
    return args, class_keys
