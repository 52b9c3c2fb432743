"""Per-splat preprocess pass: cull, project, cov2D, conic, radii, tile AABB.

Parity target: cuda_rasterizer/forward.cu preprocessCUDA:156-268. On TPU
this is a plain batched jnp pass — XLA fuses the whole thing; only the
per-pixel blend needs a kernel.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from . import sh as sh_ops
from .covariance import compute_cov3d, compute_cov2d, conic_and_radius
from .transforms import ndc_to_pix

# Near-plane cull threshold (auxiliary.h in_frustum: p_view.z <= 0.2).
NEAR_CULL_Z = 0.2


@dataclasses.dataclass(frozen=True)
class RasterCamera:
    """Static+array camera description for rasterization.

    ``w2c`` and ``proj`` are math-convention matrices (x_cam = W2C @ x_w);
    ``full_proj = proj @ w2c``. W/H are static python ints (shape-defining).
    """
    w2c: jnp.ndarray         # [4,4]
    proj: jnp.ndarray        # [4,4] perspective projection
    width: int
    height: int
    tan_fovx: float
    tan_fovy: float

    @property
    def focal_x(self) -> float:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2.0 * self.tan_fovy)

    @property
    def cx(self) -> float:
        # rasterizer_impl.cu:339 — principal point fixed at image center
        return self.width * 0.5

    @property
    def cy(self) -> float:
        return self.height * 0.5

    @property
    def full_proj(self) -> jnp.ndarray:
        return self.proj @ self.w2c

    @property
    def cam_center(self) -> jnp.ndarray:
        R = self.w2c[:3, :3]
        t = self.w2c[:3, 3]
        return -R.T @ t


class ProcessedSplats(NamedTuple):
    mean2d: jnp.ndarray       # [P,2] pixel coords
    depth: jnp.ndarray        # [P] camera-space z
    conic: jnp.ndarray        # [P,3] inverse 2D covariance (a,b,c)
    radius: jnp.ndarray       # [P] float, 0 for culled
    rgb: jnp.ndarray          # [P,3] view-dependent color (from SH or precomp)
    visible: jnp.ndarray      # [P] bool (radius > 0 and in frustum)
    rect_min: jnp.ndarray     # [P,2] int32 tile coords (x,y)
    rect_max: jnp.ndarray     # [P,2] int32 tile coords exclusive
    tiles_touched: jnp.ndarray  # [P] int32


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    cam: RasterCamera,
    shs: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    tile_w: int = 128,
    tile_h: int = 8,
    mean2d_offset: Optional[jnp.ndarray] = None,
    opacity: Optional[jnp.ndarray] = None,
) -> ProcessedSplats:
    """Vectorized splat preprocess (forward.cu:156-268).

    ``mean2d_offset`` is an optional [P,2] zero tensor added to the projected
    pixel means — differentiate w.r.t. it to obtain the screen-space
    gradients used for densification (the JAX analogue of the reference's
    ``screenspace_points`` trick, gaussian_renderer/__init__.py:61-67).
    """
    # Component-wise math on [P] vectors throughout: [P,3] intermediates
    # pad 3 -> 128 lanes on TPU (see covariance.py layout note).
    mx, my, mz = means3d[..., 0], means3d[..., 1], means3d[..., 2]

    # Frustum cull on camera-space depth
    w2c = cam.w2c
    depth = w2c[2, 0] * mx + w2c[2, 1] * my + w2c[2, 2] * mz + w2c[2, 3]
    in_front = depth > NEAR_CULL_Z

    # Project to NDC -> pixels (transformPoint4x4 + ndc2Pix)
    fp = cam.full_proj
    hx = fp[0, 0] * mx + fp[0, 1] * my + fp[0, 2] * mz + fp[0, 3]
    hy = fp[1, 0] * mx + fp[1, 1] * my + fp[1, 2] * mz + fp[1, 3]
    hw = fp[3, 0] * mx + fp[3, 1] * my + fp[3, 2] * mz + fp[3, 3]
    # culled splats can sit at w ~ 0; clamp so the divide stays finite and
    # no NaN leaks through visibility masks in reverse mode
    inv_w = 1.0 / jnp.maximum(hw + 1e-7, 1e-3)
    mean2d = jnp.stack([ndc_to_pix(hx * inv_w, cam.width),
                        ndc_to_pix(hy * inv_w, cam.height)], -1)
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    # Covariances
    cov3d = cov3d_precomp if cov3d_precomp is not None else compute_cov3d(
        scales, quats, scale_modifier)
    cov2d = compute_cov2d(means3d, cov3d, cam.w2c,
                          cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy)
    if opacity is None:
        conic, radius, det_ok = conic_and_radius(cov2d)
        r_bin = radius
    else:
        # opacity-aware binning radius: bit-identical output with fewer
        # pairs — the blend skips alpha < 1/255 samples anyway (see
        # covariance.conic_and_radius). `radius` (reported for densify
        # stats) stays the reference's 3-sigma value.
        conic, radius, det_ok, r_bin = conic_and_radius(cov2d, opacity)

    # Tile AABB (auxiliary.h getRect), exclusive max
    grid_x = (cam.width + tile_w - 1) // tile_w
    grid_y = (cam.height + tile_h - 1) // tile_h
    rmin_x = jnp.clip(((mean2d[..., 0] - r_bin) / tile_w).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((mean2d[..., 1] - r_bin) / tile_h).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((mean2d[..., 0] + radius + tile_w - 1) / tile_w).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((mean2d[..., 1] + radius + tile_h - 1) / tile_h).astype(jnp.int32), 0, grid_y)
    if opacity is not None:
        # getRect's `(int)((p + r + tile - 1) / tile)` under-covers float
        # centers when p + r lands in [tile*t, tile*t + 1) — a dead zone
        # whose position shifts with r. The 3-sigma rect above reproduces
        # the reference's coverage exactly; the tight rect must therefore
        # be a proper ceil on r_bin INTERSECTED with it, so coverage is
        # exactly the reference's minus provably sub-threshold tiles.
        rmax_x = jnp.minimum(rmax_x, jnp.clip(jnp.floor(
            (mean2d[..., 0] + r_bin) / tile_w).astype(jnp.int32) + 1, 0, grid_x))
        rmax_y = jnp.minimum(rmax_y, jnp.clip(jnp.floor(
            (mean2d[..., 1] + r_bin) / tile_h).astype(jnp.int32) + 1, 0, grid_y))
    tiles = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    visible = in_front & det_ok & (tiles > 0)
    radius = jnp.where(visible, radius, 0.0)
    tiles = jnp.where(visible, tiles, 0).astype(jnp.int32)

    # Colors
    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        assert shs is not None
        cc = cam.cam_center
        dx, dy, dz = mx - cc[0], my - cc[1], mz - cc[2]
        inv_n = 1.0 / jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
        rgb = sh_ops.sh_to_rgb_fast(sh_degree, shs,
                                    dx * inv_n, dy * inv_n, dz * inv_n)

    return ProcessedSplats(
        mean2d=mean2d, depth=depth, conic=conic, radius=radius, rgb=rgb,
        visible=visible,
        rect_min=jnp.stack([rmin_x, rmin_y], -1),
        rect_max=jnp.stack([rmax_x, rmax_y], -1),
        tiles_touched=tiles)
