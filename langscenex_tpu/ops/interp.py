"""Bilinear/bicubic sampling (torch.grid_sample / F.interpolate
equivalents used by the reference).

align_corners=True + border padding semantics, expressed directly in pixel
coordinates (the reference converts pixels -> [-1,1] and back; the
composition is the identity mapping used here).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch F.interpolate bicubic kernel (a = -0.75; jax.image.resize
    uses a = -0.5, which does NOT match torch)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
        np.where(ax < 2, a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a,
                 0.0))
    return w


def _bicubic_weights(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] torch-convention bicubic weights (align_corners=False,
    half-pixel centers, edge-clamped taps, no antialias)."""
    scale = n_in / n_out
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    A = np.zeros((n_out, n_in), np.float64)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(base + tap, 0, n_in - 1)
        w = _cubic_kernel(src - (base + tap))
        np.add.at(A, (np.arange(n_out), idx), w)
    return A.astype(np.float32)


def resize_bicubic_torch(x: jnp.ndarray, size) -> jnp.ndarray:
    """Bicubic resize matching torch F.interpolate(mode='bicubic',
    align_corners=False, antialias=False) on channels-last [..., H, W, C].
    Expressed as two dense matmuls (MXU-friendly; sizes are static)."""
    Ho, Wo = size
    Hi, Wi = x.shape[-3], x.shape[-2]
    Ah = jnp.asarray(_bicubic_weights(Ho, Hi))
    Aw = jnp.asarray(_bicubic_weights(Wo, Wi))
    y = jnp.einsum('oh,...hwc->...owc', Ah, x)
    return jnp.einsum('pw,...owc->...opc', Aw, y)


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
