"""Slow numpy reference rasterizer implementing the sequential CUDA
semantics (forward.cu renderCUDA:273-431) literally, pixel by pixel.
Used as the golden oracle for the vectorized/Pallas implementations."""
from __future__ import annotations

import numpy as np


def naive_blend(point_lists, mean2d, conic, opacity, channels, H, W, bg,
                n_color_ch=3, rect_min=None, rect_max=None,
                tile_w=None, tile_h=None):
    """point_lists: dict pixel-independent — here a single global
    depth-sorted candidate list per pixel region is fine for tiny tests:
    we pass the per-tile ordering as a list of splat ids per tile of size
    (H, W) covering tile = whole image."""
    C = channels.shape[1]
    out = np.zeros((C, H, W), np.float32)
    final_T = np.ones((H, W), np.float32)
    observe = np.zeros(mean2d.shape[0], np.int64)
    for py in range(H):
        for px in range(W):
            T = 1.0
            acc = np.zeros(C, np.float32)
            for sid in point_lists:
                if rect_min is not None:
                    # Same tile-rect culling the binning applies: a splat only
                    # reaches pixels whose tile lies in its rect.
                    tx, ty = px // tile_w, py // tile_h
                    if not (rect_min[sid, 0] <= tx < rect_max[sid, 0]
                            and rect_min[sid, 1] <= ty < rect_max[sid, 1]):
                        continue
                a, b, c = conic[sid]
                dx = mean2d[sid, 0] - px
                dy = mean2d[sid, 1] - py
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0.0:
                    continue
                alpha = min(0.99, opacity[sid] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                acc += channels[sid] * alpha * T
                if T > 0.5:
                    observe[sid] += 1
                T = test_T
            out[:, py, px] = acc
            out[:n_color_ch, py, px] += T * bg[:n_color_ch]
            final_T[py, px] = T
    return out, final_T, observe
