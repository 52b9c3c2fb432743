"""Bilinear sampling (torch.grid_sample equivalents used by the reference).

align_corners=True + border padding semantics, expressed directly in pixel
coordinates (the reference converts pixels -> [-1,1] and back; the
composition is the identity mapping used here).
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_border(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample [C,H,W] at pixel coords xy [N,2] (x, y), border-clamped
    bilinear (grid_sample mode='bilinear', padding='border',
    align_corners=True). Returns [C,N]."""
    C, H, W = img.shape
    x = jnp.clip(xy[:, 0], 0.0, W - 1.0)
    y = jnp.clip(xy[:, 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = x - x0
    wy = y - y0
    a = img[:, y0, x0]
    b = img[:, y0, x1]
    c = img[:, y1, x0]
    d = img[:, y1, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)
