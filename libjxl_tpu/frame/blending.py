"""Frame blending for multi-frame / animated images.

Reference: lib/jxl/blending.cc PerformBlending /
render_pipeline/stage_blending.cc. Operates on float linear color
planes with an optional alpha plane; src is blitted into the canvas at
the frame origin with the frame's blend mode.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.frame.frame_header import BlendMode


def blend_frame(canvas: np.ndarray, canvas_alpha: np.ndarray | None,
                src: np.ndarray, src_alpha: np.ndarray | None,
                mode: int, x0: int, y0: int,
                alpha_is_premultiplied: bool = False) -> None:
    """Blends src (H,W,3) into canvas in place; alphas are (H,W) in
    [0,1] or None (treated as opaque)."""
    h, w = src.shape[:2]
    ch, cw = canvas.shape[:2]
    # Clip the blit rect to the canvas.
    sx0, sy0 = max(0, -x0), max(0, -y0)
    dx0, dy0 = max(0, x0), max(0, y0)
    bw = min(w - sx0, cw - dx0)
    bh = min(h - sy0, ch - dy0)
    if bw <= 0 or bh <= 0:
        return
    dsl = (slice(dy0, dy0 + bh), slice(dx0, dx0 + bw))
    ssl = (slice(sy0, sy0 + bh), slice(sx0, sx0 + bw))

    s = src[ssl]
    sa = src_alpha[ssl] if src_alpha is not None else None
    d = canvas[dsl]
    da = canvas_alpha[dsl] if canvas_alpha is not None else None

    if mode == BlendMode.REPLACE:
        canvas[dsl] = s
        if canvas_alpha is not None:
            canvas_alpha[dsl] = sa if sa is not None else 1.0
    elif mode == BlendMode.ADD:
        canvas[dsl] = d + s
        if canvas_alpha is not None and sa is not None:
            canvas_alpha[dsl] = np.clip(da + sa, 0.0, 1.0)
    elif mode == BlendMode.MUL:
        canvas[dsl] = d * s
    elif mode == BlendMode.BLEND:
        a_s = sa if sa is not None else np.ones((bh, bw), np.float32)
        a_d = da if da is not None else np.ones((bh, bw), np.float32)
        if alpha_is_premultiplied:
            out = s + d * (1.0 - a_s)[..., None]
            new_a = a_s + a_d * (1.0 - a_s)
        else:
            new_a = a_s + a_d * (1.0 - a_s)
            safe = np.where(new_a == 0, 1.0, new_a)
            out = (s * a_s[..., None]
                   + d * (a_d * (1.0 - a_s))[..., None]) / safe[..., None]
            out = np.where((new_a == 0)[..., None], 0.0, out)
        canvas[dsl] = out
        if canvas_alpha is not None:
            canvas_alpha[dsl] = new_a
    elif mode == BlendMode.ALPHA_WEIGHTED_ADD:
        a_s = sa if sa is not None else np.ones((bh, bw), np.float32)
        canvas[dsl] = d + s * a_s[..., None]
        if canvas_alpha is not None and sa is not None:
            canvas_alpha[dsl] = np.clip(da + sa, 0.0, 1.0)
    else:
        raise ValueError(f"unknown blend mode {mode}")
