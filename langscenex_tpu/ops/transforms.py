"""Camera transform / projection matrices.

Conventions: all matrices here are ROW-vector-free, plain math convention —
``x_cam = W2C[:3, :3] @ x_world + W2C[:3, 3]`` — i.e. the transpose of the
tensors the reference passes around (it stores transposed matrices and does
``x @ M``; see scene/cameras.py:104-113). Numerical results are identical.

Parity targets: graphics_utils.getWorld2View2:128, getProjectionMatrix:141,
getProjectionMatrixCenterShift:166, fov2focal/focal2fov:186-190, and the
kernel-side ndc2Pix (auxiliary.h:41-44).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=(0.0, 0.0, 0.0), scale: float = 1.0) -> np.ndarray:
    """4x4 world-to-camera from COLMAP-style (R, t).

    R is camera-to-world rotation (COLMAP reader stores it transposed,
    dataset_readers convention), t is world-to-camera translation — mirrors
    getWorld2View2 including the optional recenter/rescale of the camera
    center.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    C2W[:3, 3] = (C2W[:3, 3] + np.asarray(translate)) * scale
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style asymmetric-capable perspective projection, z in [0, zfar
    mapping] with z_sign=+1 as the reference (graphics_utils.py:141-163)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def projection_matrix_center_shift(znear: float, zfar: float, cx: float, cy: float,
                                   fx: float, fy: float, w: int, h: int) -> np.ndarray:
    """Principal-point-aware projection (graphics_utils.py:166-183)."""
    top = cy / fy * znear
    bottom = -(h - cy) / fy * znear
    left = -(w - cx) / fx * znear
    right = cx / fx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def ndc_to_pix(v: jnp.ndarray, size) -> jnp.ndarray:
    """((v + 1) * S - 1) / 2 — auxiliary.h ndc2Pix."""
    return ((v + 1.0) * size - 1.0) * 0.5


def transform_points(M: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 M to [..., 3] points with perspective divide.

    HIGHEST precision: TPU's default bf16 matmul quantizes coordinates at
    pixel scale after projection (see train/multiview.py note)."""
    _hi = jax.lax.Precision.HIGHEST
    hom = jnp.matmul(pts, M[:3, :3].T, precision=_hi) + M[:3, 3]
    w = jnp.matmul(pts, M[3, :3].T, precision=_hi) + M[3, 3]
    return hom / (w[..., None] + 1e-7)


def transform_points_3x4(M: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid 4x4 (no divide) to [..., 3] points."""
    return jnp.matmul(pts, M[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + M[:3, 3]
