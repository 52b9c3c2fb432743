"""Depth map -> camera-space point map -> cross-product normals.

Parity targets: field_construction/utils/graphics_utils.py depth2point_cam
(:28-40), depth_pcd2normal (:49-77, no-offset path), normal_from_depth_image
(:80-86), and the renderer's render_normal (gaussian_renderer/__init__.py:28-40).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_to_points_cam(depth: jnp.ndarray, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """[H,W] depth + [3,3] K -> [H,W,3] camera-space points.

    Follows the reference's NDC convention: pixel grid normalized by
    (W-1, H-1), scaled back by (W-1, H-1)*z, then K^-T applied — which for a
    standard K (fx, fy, cx, cy) equals the usual unprojection."""
    H, W = depth.shape
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing='xy')
    # cam_xyz = [u*z, v*z, z] @ K^-T  (ndc_2_cam with inv_scale folded in)
    uvz = jnp.stack([gx * depth, gy * depth, depth], axis=-1)
    Kinv = jnp.linalg.inv(intrinsic)
    # HIGHEST: points_to_normals differences NEIGHBORING outputs — bf16
    # matmul quantization of the point map turns those tiny differences
    # (and the resulting normals) into noise on TPU.
    return jnp.matmul(uvz, Kinv.T, precision=jax.lax.Precision.HIGHEST)


def points_to_normals(xyz: jnp.ndarray) -> jnp.ndarray:
    """[H,W,3] points -> [H,W,3] unit normals via central-difference cross
    product, zero border (depth_pcd2normal:49-77)."""
    bottom = xyz[2:, 1:-1]
    top = xyz[:-2, 1:-1]
    right = xyz[1:-1, 2:]
    left = xyz[1:-1, :-2]
    lr = right - left
    bt = top - bottom
    n = jnp.cross(lr, bt)
    # gradient-safe normalize: grad of ||n|| at n=0 is NaN otherwise
    norm = jnp.sqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True), 1e-24))
    n = n / norm
    return jnp.pad(n, ((1, 1), (1, 1), (0, 0)), mode='constant')


def normal_from_depth(depth: jnp.ndarray, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """[H,W] depth + K -> [H,W,3] camera-space normals."""
    return points_to_normals(depth_to_points_cam(depth, intrinsic))
