"""Quaternion math (wxyz convention, matching the reference).

Parity targets: field_construction/utils/pose_utils.py:13-218 (quad2rotation,
rotation2quad, quadmultiply, get_camera_from_tensor, get_tensor_from_camera)
and the rasterizer's in-kernel quat->rot (forward.cu:119-152). All ops are
pure jnp, batch-friendly, and autodiff-safe.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # sqrt(max(...)) keeps the gradient finite at q == 0
    norm = jnp.sqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), eps * eps))
    return q / norm


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) -> [..., 3, 3] rotation matrix.

    Matches forward.cu:135-141 / pose_utils.quad2rotation. NOTE: does NOT
    normalize q (the rasterizer kernel's computeCov3D uses q as-is; the
    reference normalizes at the activation level instead).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w,x,y,z). Branch-free Shepperd's method:
    compute all four candidate quats and select the numerically best, so it
    is safe under vmap/jit (no data-dependent control flow)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is largest.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]

    cand = jnp.stack([
        jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0)], -1),
        jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1)], -1),
        jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2)], -1),
        jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3], -1),
    ], axis=-2)  # [..., 4 candidates, 4]

    pivots = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # Canonical sign: w >= 0
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return quat_normalize(q)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1*q2, wxyz (pose_utils.quadmultiply:89)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def camera_from_tensor(qt: jnp.ndarray) -> jnp.ndarray:
    """[..., 7] (quat wxyz, t xyz) -> [..., 4, 4] world-to-camera matrix.
    Parity: pose_utils.get_camera_from_tensor:60 (quat normalized there)."""
    q = quat_normalize(qt[..., :4])
    t = qt[..., 4:7]
    R = quat_to_rotmat(q)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=qt.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def tensor_from_camera(RT: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] w2c -> [..., 7] (quat wxyz, t).
    Parity: pose_utils.get_tensor_from_camera:186."""
    R = RT[..., :3, :3]
    t = RT[..., :3, 3]
    return jnp.concatenate([rotmat_to_quat(R), t], axis=-1)
