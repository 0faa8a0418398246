"""Per-stage device profile of the v2 decode pipeline.

Times each stage of decode_frame_device2 as its own jitted program on a
bench-corpus feed, plus the transfer and dispatch costs, so kernel work
is attacked by measurement instead of guesswork (VERDICT.md r3 weak 3).

Usage: python tools/profile_device.py [--stream PATH] [--reps N]
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, reps, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", default=None)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libjxl_tpu.ops.filters_tpu import (apply_loop_filters_tpu,
                                            gaborish_tpu)
    from libjxl_tpu.ops.decode_tpu import xyb_to_pq16, xyb_to_srgb8
    from libjxl_tpu.tpu.batch_decode import parse_to_feed
    from libjxl_tpu.tpu.feed import family8_matrices
    from libjxl_tpu.tpu.pipeline import decode_frame_device2, decode_xyb2

    path = args.stream
    if path is None:
        cands = sorted(glob.glob(os.path.join(
            os.path.dirname(__file__), "..", "bench_corpus", "*.jxl")))
        if not cands:
            raise SystemExit("no bench_corpus stream; pass --stream")
        path = cands[0]
    data = open(path, "rb").read()

    t0 = time.perf_counter()
    feed = parse_to_feed(data)
    t_parse = time.perf_counter() - t0
    H, W = feed["image_hw"]
    mpix = H * W / 1e6
    print(f"stream: {path} ({len(data)} bytes), {W}x{H} = {mpix:.1f} MPix")
    print(f"host parse_to_feed: {t_parse*1e3:.0f} ms "
          f"({mpix/t_parse:.1f} MP/s)")

    lf = feed["lf"]
    cshape = feed["coeff_img"].shape
    print(f"coeff shape {cshape}, classes={sorted(feed['classes'])}, "
          f"nnz={feed['coeff_nz'][0].size if feed.get('coeff_nz') is not None else 'dense'}, "
          f"gab={lf.gab} epf={lf.epf_iters}")

    # --- end-to-end reference points --------------------------------
    def full():
        return decode_frame_device2(feed, H, W, as_numpy=False,
                                    out="pq16")
    t_full = timeit(full, args.reps)
    print(f"\nfull decode_frame_device2 (pack+transfer+compute): "
          f"{t_full*1e3:.1f} ms ({mpix/t_full:.1f} MP/s)")

    # --- transfer cost ----------------------------------------------
    nz = feed.get("coeff_nz")
    sizes = {"coeff_nz": nz[0].nbytes + nz[1].nbytes if nz is not None
             else feed["coeff_img"].nbytes}
    total_b = sum(sizes.values()) + feed["dc"].nbytes + 6 * (
        feed["mat_ids"].size)
    buf = np.zeros(max(total_b, 1 << 20), np.uint8)
    t_put = timeit(lambda b: jax.device_put(b), args.reps, buf)
    print(f"device_put {buf.nbytes/1e6:.1f} MB: {t_put*1e3:.1f} ms "
          f"({buf.nbytes/t_put/1e9:.2f} GB/s)")
    tiny = np.zeros(4, np.uint8)
    t_tiny = timeit(lambda b: jax.device_put(b), args.reps, tiny)
    print(f"device_put 4B (round-trip floor): {t_tiny*1e3:.2f} ms")

    # --- device-resident stage timings ------------------------------
    # Build device-resident inputs once.
    dense_coeff = np.zeros(cshape, np.int16)
    if nz is not None:
        flat = dense_coeff.reshape(-1)
        np.add.at(flat, nz[0], nz[1])
    else:
        dense_coeff = feed["coeff_img"]
    dcoeff = jax.device_put(dense_coeff)
    dbank = jax.device_put(family8_matrices())
    d = {k: jax.device_put(np.asarray(v)) for k, v in feed.items()
         if isinstance(v, np.ndarray)}
    big_tables = {k: jax.device_put(v)
                  for k, v in feed["big_tables"].items()}
    masks = feed.get("class_masks") or {}
    dmasks = {k: jax.device_put(np.asarray(m)) for k, m in masks.items()}
    inv_gs = float(feed["inv_gs"])
    qmul = jnp.asarray(feed["qmul"], jnp.float32)
    BWb = feed["mat_ids"].shape[1]

    if nz is not None:
        nzi = jax.device_put(nz[0])
        nzv = jax.device_put(nz[1])

        @jax.jit
        def scatter(nzi, nzv):
            return jnp.zeros(cshape[0] * cshape[1] * cshape[2], jnp.int16
                             ).at[nzi].add(nzv).reshape(cshape)
        t = timeit(scatter, args.reps, nzi, nzv)
        print(f"\nsparse scatter ({nz[0].size} nz): {t*1e3:.1f} ms")

    @jax.jit
    def xyb_fn(coeff, mat_ids, raw_quant, dc, fx, fb, tables8, biases,
               *mask_vals):
        cm = {k: v.astype(jnp.bool_)
              for k, v in zip(sorted(dmasks), mask_vals)}
        return decode_xyb2(coeff, mat_ids, raw_quant.astype(jnp.int32),
                           dc, fx, fb, inv_gs, qmul, tables8, dbank,
                           big_tables, None, biases, BWb, class_masks=cm)
    xyb_args = (dcoeff, d["mat_ids"], d["raw_quant"], d["dc"], d["fx"],
                d["fb"], d["tables8"], d["biases"],
                *[dmasks[k] for k in sorted(dmasks)])
    t_xyb = timeit(xyb_fn, args.reps, *xyb_args)
    print(f"decode_xyb2 (dequant+CfL+IDCT all classes): {t_xyb*1e3:.1f} ms")

    xyb = jax.block_until_ready(xyb_fn(*xyb_args))[:, :H, :W]

    # IDCT 8x8 bank alone: time the xyb core with big classes removed.
    @jax.jit
    def xyb8_fn(coeff, mat_ids, raw_quant, dc, fx, fb, tables8, biases):
        return decode_xyb2(coeff, mat_ids, raw_quant.astype(jnp.int32),
                           dc, fx, fb, inv_gs, qmul, tables8, dbank,
                           {}, None, biases, BWb, class_masks={})
    t_xyb8 = timeit(xyb8_fn, args.reps, *xyb_args[:8])
    print(f"  8x8-family only (bank matmuls): {t_xyb8*1e3:.1f} ms")
    print(f"  big classes (by difference):    {(t_xyb - t_xyb8)*1e3:.1f} ms")

    gab_j = jax.jit(lambda x: gaborish_tpu(
        x, ((0.115169525, 0.061248592),) * 3))
    t_gab = timeit(gab_j, args.reps, xyb)
    print(f"gaborish: {t_gab*1e3:.1f} ms")

    for ei in (1, 2, 3):
        f = jax.jit(lambda x, s, ei=ei: apply_loop_filters_tpu(
            x, s, epf_iters=ei, gab=False))
        t = timeit(f, args.reps, xyb, d["inv_sigma"])
        print(f"EPF iters={ei}: {t*1e3:.1f} ms")

    t_pq = timeit(jax.jit(xyb_to_pq16), args.reps, xyb)
    print(f"xyb->pq16: {t_pq*1e3:.1f} ms")
    t_s8 = timeit(jax.jit(xyb_to_srgb8), args.reps, xyb)
    print(f"xyb->srgb8: {t_s8*1e3:.1f} ms")

    # Device-resident full chain (no transfer): jit of everything.
    @jax.jit
    def chain(coeff, mat_ids, raw_quant, dc, fx, fb, tables8, biases,
              inv_sigma, *mask_vals):
        cm = {k: v.astype(jnp.bool_)
              for k, v in zip(sorted(dmasks), mask_vals)}
        x = decode_xyb2(coeff, mat_ids, raw_quant.astype(jnp.int32),
                        dc, fx, fb, inv_gs, qmul, tables8, dbank,
                        big_tables, None, biases, BWb, class_masks=cm)
        x = x[:, :H, :W]
        x = apply_loop_filters_tpu(x, inv_sigma,
                                   epf_iters=int(lf.epf_iters),
                                   gab=bool(lf.gab))
        return xyb_to_pq16(x)
    chain_args = (dcoeff, d["mat_ids"], d["raw_quant"], d["dc"], d["fx"],
                  d["fb"], d["tables8"], d["biases"], d["inv_sigma"],
                  *[dmasks[k] for k in sorted(dmasks)])
    t_chain = timeit(chain, args.reps, *chain_args)
    print(f"\ndevice-resident full chain (no transfer): {t_chain*1e3:.1f} ms"
          f" ({mpix/t_chain:.1f} MP/s)")
    print(f"=> transfer+pack+dispatch overhead in full path: "
          f"{(t_full - t_chain)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
