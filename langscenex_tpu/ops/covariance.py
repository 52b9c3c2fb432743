"""3D -> 2D Gaussian covariance math (EWA splatting).

Parity targets: cuda_rasterizer/forward.cu computeCov3D:119-152 and
computeCov2D:75-114. The glm column-major algebra in the reference reduces
to the standard formulations implemented here:

  Sigma3D = R(q) @ diag(s^2) @ R(q)^T              (forward.cu:119-152)
  Sigma2D = J @ Rw2c @ Sigma3D @ Rw2c^T @ J^T + 0.3*I   (forward.cu:75-114)

with J the affine approximation of the perspective projection evaluated at
the (fov-clamped) camera-space point.

TPU layout note: all math is written component-wise on [P] vectors — a
[P, 3] array pads its 3-wide minor dim to 128 lanes on TPU, turning every
materialized intermediate into ~42x its logical size; component form keeps
intermediates dense (measured 9ms -> sub-ms for the full preprocess at
P=100k).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Low-pass filter added to the 2D covariance diagonal so every splat is at
# least ~1px wide (forward.cu:110-113).
COV2D_DILATE = 0.3


def _quat_rot_elems(q: jnp.ndarray):
    """Rotation matrix elements (9 [P] vectors, row-major) from [P,4] wxyz."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y))


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """[P,3] activated scales + [P,4] wxyz quats -> [P,6] packed upper
    triangle (xx, xy, xz, yy, yz, zz) of Sigma3D."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _quat_rot_elems(quats)
    s0 = (scales[..., 0] * scale_modifier) ** 2
    s1 = (scales[..., 1] * scale_modifier) ** 2
    s2 = (scales[..., 2] * scale_modifier) ** 2
    # Sigma_ij = sum_k s_k^2 R_ik R_jk
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


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
    px, py, pz = means3d[..., 0], means3d[..., 1], means3d[..., 2]
    R = w2c[:3, :3]
    tvec = w2c[:3, 3]
    tx = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + tvec[0]
    ty = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + tvec[1]
    tz = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + tvec[2]
    # splats at/behind the camera are frustum-culled (z <= 0.2) but still
    # traverse this math; clamp tz so 1/tz can't produce inf/NaN that
    # leaks through the visibility mask in reverse mode
    tz = jnp.maximum(tz, 0.11)
    # fov clamp (forward.cu:86-91)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = jnp.clip(tx / tz, -limx, limx) * tz
    ty = jnp.clip(ty / tz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    jx = focal_x * inv_tz           # J[0,0]
    jy = focal_y * inv_tz           # J[1,1]
    jxz = -focal_x * tx * inv_tz * inv_tz   # J[0,2]
    jyz = -focal_y * ty * inv_tz * inv_tz   # J[1,2]
    # M = J @ R (2x3), rows m0, m1
    m00 = jx * R[0, 0] + jxz * R[2, 0]
    m01 = jx * R[0, 1] + jxz * R[2, 1]
    m02 = jx * R[0, 2] + jxz * R[2, 2]
    m10 = jy * R[1, 0] + jyz * R[2, 0]
    m11 = jy * R[1, 1] + jyz * R[2, 1]
    m12 = jy * R[1, 2] + jyz * R[2, 2]

    xx, xy, xz = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    yy, yz, zz = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]
    # u = Sigma @ m0, v = Sigma @ m1
    u0 = xx * m00 + xy * m01 + xz * m02
    u1 = xy * m00 + yy * m01 + yz * m02
    u2 = xz * m00 + yz * m01 + zz * m02
    v0 = xx * m10 + xy * m11 + xz * m12
    v1 = xy * m10 + yy * m11 + yz * m12
    v2 = xz * m10 + yz * m11 + zz * m12
    a = m00 * u0 + m01 * u1 + m02 * u2 + COV2D_DILATE
    b = m00 * v0 + m01 * v1 + m02 * v2
    c = m10 * v0 + m11 * v1 + m12 * v2 + COV2D_DILATE
    return jnp.stack([a, b, c], -1)


def conic_and_radius(cov2d: jnp.ndarray, opacity=None):
    """Invert 2D covariance and compute the 3-sigma pixel radius
    (forward.cu:219-232).

    Returns (conic [P,3], radius [P] float, valid [P] bool). Invalid
    (det==0) splats get radius 0.

    When ``opacity`` [P] is given, a fourth array is returned: the
    OPACITY-AWARE binning radius. The blend skips samples with
    alpha = o*exp(-q/2) < 1/255 (forward.cu:377-380 and both TPU blend
    paths), so the splat's true support is q <= 2*ln(255*o); the radius
    sqrt(min(9, 2*ln(255*o)) * lam_max) bounds that support and is never
    larger than the reference's 3-sigma radius. Binning with it produces
    BIT-IDENTICAL output with fewer (tile, splat) pairs — low-opacity
    splats (o < 0.353) shrink, and o <= 1/255 splats (which cannot pass
    the alpha threshold anywhere) drop out entirely.
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
    radius = jnp.where(valid, radius, 0.0)
    if opacity is None:
        return conic, radius, valid
    o = jax.lax.stop_gradient(opacity.reshape(-1))
    # +0.05 q-margin: the blend evaluates alpha = o*exp(power) in f32 and
    # can round a just-outside sample up to the 1/255 threshold; the
    # margin (sub-pixel in radius) keeps every such borderline sample
    # inside the binned support so the output matches 3-sigma binning.
    qmax = jnp.minimum(9.0, 2.0 * jnp.log(jnp.maximum(255.0 * o, 1e-12))
                       + 0.05)
    r_bin = jnp.ceil(jnp.sqrt(jnp.maximum(qmax, 0.0)
                              * jnp.maximum(lam_max, 0.0)))
    return conic, radius, valid, jnp.where(valid, r_bin, 0.0)
