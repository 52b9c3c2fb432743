"""3D -> 2D Gaussian covariance math (EWA splatting).

Parity targets: cuda_rasterizer/forward.cu computeCov3D:119-152 and
computeCov2D:75-114. The glm column-major algebra in the reference reduces
to the standard formulations implemented here:

  Sigma3D = R(q) @ diag(s^2) @ R(q)^T              (forward.cu:119-152)
  Sigma2D = J @ Rw2c @ Sigma3D @ Rw2c^T @ J^T + 0.3*I   (forward.cu:75-114)

with J the affine approximation of the perspective projection evaluated at
the (fov-clamped) camera-space point. All functions are batched over the
leading splat axis and are plain jnp (XLA fuses them into the preprocess
pass; no Pallas needed here).
"""
from __future__ import annotations

import jax.numpy as jnp

from .quat import quat_to_rotmat

# Low-pass filter added to the 2D covariance diagonal so every splat is at
# least ~1px wide (forward.cu:110-113).
COV2D_DILATE = 0.3


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """[P,3] activated scales + [P,4] wxyz quats -> [P,6] packed upper
    triangle (xx, xy, xz, yy, yz, zz) of Sigma3D."""
    R = quat_to_rotmat(quats)                       # [P,3,3]
    S2 = (scales * scale_modifier) ** 2             # [P,3]
    # Sigma = R diag(S2) R^T  ==  (R*S2[None]) @ R^T
    M = R * S2[..., None, :]
    Sigma = jnp.einsum('...ik,...jk->...ij', M, R)
    return jnp.stack([Sigma[..., 0, 0], Sigma[..., 0, 1], Sigma[..., 0, 2],
                      Sigma[..., 1, 1], Sigma[..., 1, 2], Sigma[..., 2, 2]],
                     axis=-1)


def unpack_sym3(c: jnp.ndarray) -> jnp.ndarray:
    """[...,6] packed -> [...,3,3] symmetric."""
    xx, xy, xz, yy, yz, zz = (c[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1)], -2)


def compute_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray, w2c: jnp.ndarray,
                  focal_x: float, focal_y: float,
                  tan_fovx: float, tan_fovy: float) -> jnp.ndarray:
    """EWA projection of 3D covariance to screen space.

    Args:
      means3d: [P,3] world-space means.
      cov3d:   [P,6] packed Sigma3D.
      w2c:     [4,4] world-to-camera (math convention).
    Returns:
      [P,3] packed (a, b, c) = (cov_xx, cov_xy, cov_yy) incl. dilation.
    """
    Rw = w2c[:3, :3]
    t = means3d @ Rw.T + w2c[:3, 3]                 # camera-space points
    tz = t[..., 2]
    # fov clamp (forward.cu:86-91)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # J rows (2x3): [[fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]]
    J = jnp.stack([
        jnp.stack([focal_x * inv_tz, jnp.zeros_like(tz), -focal_x * tx * inv_tz2], -1),
        jnp.stack([jnp.zeros_like(tz), focal_y * inv_tz, -focal_y * ty * inv_tz2], -1),
    ], axis=-2)                                     # [P,2,3]
    M = J @ Rw                                      # [P,2,3]
    Sigma = unpack_sym3(cov3d)                      # [P,3,3]
    cov = M @ Sigma @ jnp.swapaxes(M, -1, -2)       # [P,2,2]
    a = cov[..., 0, 0] + COV2D_DILATE
    b = cov[..., 0, 1]
    c = cov[..., 1, 1] + COV2D_DILATE
    return jnp.stack([a, b, c], -1)


def conic_and_radius(cov2d: jnp.ndarray):
    """Invert 2D covariance and compute the 3-sigma pixel radius
    (forward.cu:219-232).

    Returns (conic [P,3], radius [P] float, valid [P] bool). Invalid
    (det==0) splats get radius 0.
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    valid = det > 0.0
    det_inv = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], -1)
    mid = 0.5 * (a + c)
    sq = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = mid + sq
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    return conic, jnp.where(valid, radius, 0.0), valid
