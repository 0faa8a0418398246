"""End-to-end JPEG XL decode benchmark — BASELINE.md config 5.

Workload: batched 4K (3840x2160) HDR (PQ, 16-bit) VarDCT streams with
progressive passes and EPF strength 3, decoded bitstream -> final
PQ-encoded uint16 pixels. The host entropy decoder (interleaved
multi-group rANS, C++) parses sections into device feeds; the jitted
TPU pipeline (dequant + CfL + all-strategy IDCT + gaborish/EPF +
XYB->PQ16) renders them; host parse of image i+1 overlaps the device
render of image i via async dispatch (SURVEY.md §2.11 mapping).

Headline metric: sustained end-to-end MPix/s (bitstream to pixels) on
one chip + one host core. vs_baseline compares against the reference's
~400 MPix/s multithreaded full-decode design target
(/root/reference/doc/xl_overview.md:7-9). Sub-metrics report the
host-parse-only and device-kernel-only rates so the bottleneck split
stays visible.
"""

import json
import time

import numpy as np

N_IMAGES = 3          # distinct 4K streams (encode-time bound)
SUSTAIN_DECODES = 12  # decodes per sustained run (cycling the corpus)
W4K, H4K = 3840, 2160


def make_corpus():
    """Distinct 4K HDR photographic-style images -> progressive EPF-3
    PQ streams (BASELINE config 5)."""
    from libjxl_tpu.api.simple import encode

    rng = np.random.default_rng(7)
    streams = []
    y, x = np.mgrid[0:H4K, 0:W4K]
    for i in range(N_IMAGES):
        chans = []
        for c in range(3):
            f1, f2 = 29 + 10 * i + 7 * c, 41 + 6 * i + 5 * c
            base = (0.28 + 0.22 * np.sin(x / f1 + c) * np.cos(y / f2 + i)
                    + 0.10 * np.sin((x + y) / (f1 + f2))
                    + rng.normal(0, 0.012, (H4K, W4K)))
            chans.append(base)
        # PQ-encoded uint16 input (values already in PQ signal domain).
        img = np.clip(np.stack(chans, axis=-1), 0.0, 0.9)
        img16 = np.round(img * 65535.0).astype(np.uint16)
        streams.append(encode(img16, distance=1.0, effort=5, hdr="pq",
                              progressive=True, epf=3))
    return streams


def main():
    import jax
    import jax.numpy as jnp

    from libjxl_tpu.tpu.batch_decode import DecodePipeline, parse_to_feed

    t_setup = time.perf_counter()
    streams = make_corpus()
    setup_s = time.perf_counter() - t_setup
    bpp = sum(len(s) for s in streams) * 8.0 / (N_IMAGES * W4K * H4K)

    def sync_all(outs):
        # block_until_ready is unreliable over tunneled devices: force
        # completion with one tiny combined fetch that depends on every
        # output.
        combined = jnp.stack([o.ravel()[:2].astype(jnp.int32)
                              for o in outs])
        return np.asarray(combined)

    # Warm-up: compile the batched pipeline (the one program both the
    # device-only and sustained metrics dispatch).
    feeds = [parse_to_feed(s) for s in streams]

    # Host parse only (the single-core entropy + feed-build stage).
    t0 = time.perf_counter()
    for s in streams:
        parse_to_feed(s)
    t_parse = time.perf_counter() - t0
    parse_mpix = N_IMAGES * W4K * H4K / 1e6 / t_parse

    # Device only: feeds pre-built on host; per-frame packed transfer +
    # async dispatch, steady state. (The vmapped batched path exists —
    # decode_frames_device_batched — but measures ~30% slower per frame
    # on this chip: the batched scatter/einsum program trades MXU/VPU
    # efficiency for fewer dispatches.)
    from libjxl_tpu.tpu.pipeline import decode_frame_device2

    def device_render(feed):
        h, w = feed["image_hw"]
        return decode_frame_device2(feed, h, w, as_numpy=False,
                                    out="pq16")

    sync_all([device_render(f) for f in feeds])
    reps = 3
    t0 = time.perf_counter()
    outs = []
    for _ in range(reps):
        for f in feeds:
            outs.append(device_render(f))
    sync_all(outs)
    t_dev = (time.perf_counter() - t0) / reps
    dev_mpix = N_IMAGES * W4K * H4K / 1e6 / t_dev

    # Sustained end-to-end: bitstream -> PQ16 pixels; parse overlapped
    # with staging/dispatch via the pipeline. Best of 2 runs.
    t_e2e = float("inf")
    for _ in range(2):
        pipe = DecodePipeline(out="pq16", max_inflight=4)
        t0 = time.perf_counter()
        futs = [pipe.submit(streams[i % N_IMAGES])
                for i in range(SUSTAIN_DECODES)]
        pipe.flush()
        sync_all([f.result() for f in futs])
        t_e2e = min(t_e2e, time.perf_counter() - t0)
        pipe.close()
    e2e_mpix = SUSTAIN_DECODES * W4K * H4K / 1e6 / t_e2e

    print(json.dumps({
        "metric": "e2e_4k_hdr_progressive_epf3_decode",
        "value": round(e2e_mpix, 1),
        "unit": "MPix/s",
        "vs_baseline": round(e2e_mpix / 400.0, 3),
        "host_parse_mpix_s": round(parse_mpix, 1),
        "device_kernel_mpix_s": round(dev_mpix, 1),
        "images": SUSTAIN_DECODES,
        "megapixels": round(SUSTAIN_DECODES * W4K * H4K / 1e6, 1),
        "bpp": round(bpp, 3),
        "encode_setup_s": round(setup_s, 1),
        "config": "BASELINE config 5: 3840x2160 PQ uint16, d1.0 e5, "
                  "progressive 2-pass, EPF=3, gaborish; sustained "
                  "bitstream->PQ16-pixels, host parse overlapped with "
                  "async device dispatch (1 host core + 1 chip)",
    }))


if __name__ == "__main__":
    main()
