"""Multi-view geometric consistency + patch-NCC photometric loss.

Parity target: the multi-view block of the training loop
(field_construction/gaussian_field.py:285-444) plus its helpers
get_points_from_depth / get_points_depth_in_depth_map
(scene/gaussian_model.py:726-758), patch_offsets/patch_warp
(utils/graphics_utils.py:183-196) and lncc (utils/loss_utils.py:120-155).

Static-shape JAX reformulation: the reference samples `sample_num` valid
pixels without replacement when there are more than sample_num valid ones;
here a fixed-size random permutation subset is taken from ALL pixels and
invalid ones are masked to weight zero — statistically equivalent
supervision with static shapes.

Two NCC formulations:

- ``ncc_dense=False`` — the reference's literal shape: gather a 7x7 patch
  around each of the 102,400 sampled centers from both images (the near
  image through the center pixel's plane homography). That is ~5M
  scattered bilinear samples; on TPU those lower to transaction-bound
  gathers and dominate the multiview step (see PARITY "Measured").
- ``ncc_dense=True`` (default) — TPU-first: warp the near image into the
  reference frame ONCE PER PIXEL, each pixel through ITS OWN plane
  homography (H*W samples, 49x fewer), then compute windowed NCC densely
  with edge-padded box sums (reduce_window — no gathers), and only then
  gather the sampled centers' scalar NCC values. When the rendered
  normal/distance field is constant over a patch the two forms are
  EXACTLY equal (the homography is then patch-constant, so every warped
  sample coincides); they differ only across geometry discontinuities,
  where the per-pixel-plane warp is the better-posed choice. Equality on
  constant-plane fields is asserted in tests/test_losses.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.interp import bilinear_sample_border
from ..ops.losses import lncc


class MultiViewOut(NamedTuple):
    geo_loss: jnp.ndarray
    ncc_loss: jnp.ndarray
    n_valid: jnp.ndarray


def _rays(H: int, W: int, fx, fy, cx, cy):
    ix = jnp.arange(W, dtype=jnp.float32)
    iy = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(ix, iy, indexing='xy')
    return jnp.stack([(gx - cx) / fx, (gy - cy) / fy, jnp.ones_like(gx)], -1)


def _box_sums(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)^2 VALID window sums of an already r-extended [H+2r, W+2r]
    array -> [H, W]."""
    return jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                 (2 * r + 1, 2 * r + 1), (1, 1), 'VALID')


def _lncc_dense(ref: jnp.ndarray, nea: jnp.ndarray, r: int):
    """Windowed NCC map from r-extended [H+2r, W+2r] images; same
    formula/eps as ops.losses.lncc on gathered patches. Returns
    (ncc [H,W], mask [H,W])."""
    tps = (2 * r + 1) ** 2
    ref_sum = _box_sums(ref, r)
    nea_sum = _box_sums(nea, r)
    ref2_sum = _box_sums(ref * ref, r)
    nea2_sum = _box_sums(nea * nea, r)
    ref_nea_sum = _box_sums(ref * nea, r)
    ref_avg = ref_sum / tps
    nea_avg = nea_sum / tps
    cross = ref_nea_sum - nea_avg * ref_sum
    ref_var = ref2_sum - ref_avg * ref_sum
    nea_var = nea2_sum - nea_avg * nea_sum
    cc = cross * cross / (ref_var * nea_var + 1e-8)
    ncc = jnp.clip(1.0 - cc, 0.0, 2.0)
    return ncc, ncc < 0.9


def multi_view_loss(key: jax.Array,
                    plane_depth: jnp.ndarray,        # [H,W] view cam
                    rendered_normal: jnp.ndarray,    # [3,H,W] camera-frame
                    rendered_distance: jnp.ndarray,  # [H,W]
                    near_plane_depth: jnp.ndarray,   # [H,W]
                    gt_gray: jnp.ndarray,            # [1,H,W]
                    near_gt_gray: jnp.ndarray,       # [1,H,W]
                    view_w2c: jnp.ndarray,           # [4,4]
                    near_w2c: jnp.ndarray,           # [4,4]
                    K: jnp.ndarray,                  # [3,3] (view==near intrinsics)
                    patch_size: int = 3,
                    sample_num: int = 102_400,
                    pixel_noise_th: float = 1.0,
                    geo_weight: float = 0.03,
                    ncc_weight: float = 0.15,
                    wo_geo_occ_aware: bool = False,
                    compute_ncc: bool = True,
                    ncc_dense: bool = True) -> MultiViewOut:
    H, W = plane_depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    # ---- forward reprojection (gaussian_field.py:316-336)
    # Every small-contraction matmul/einsum below is pinned to HIGHEST:
    # TPU matmuls default to bf16 inputs, and 2^-8 relative error on
    # point coordinates is ~3 px at this focal length — against a 1 px
    # geo-noise threshold that turns the whole multiview loss into
    # noise (same class of TPU trap as the SSIM variance, ops/losses.py).
    _HI = jax.lax.Precision.HIGHEST
    rays = _rays(H, W, fx, fy, cx, cy)                     # [H,W,3]
    pts_cam = rays * plane_depth[..., None]
    Rv, tv = view_w2c[:3, :3], view_w2c[:3, 3]
    Rn, tn = near_w2c[:3, :3], near_w2c[:3, 3]
    # x_w = Rv^T (x_cam - tv): (x - tv) @ Rv applies Rv^T row-wise
    pts_world = jnp.matmul(pts_cam.reshape(-1, 3) - tv, Rv, precision=_HI)
    pts_near = jnp.matmul(pts_world, Rn.T, precision=_HI) + tn

    # sample nearest cam's depth at the projections (:337-341, helper :726-748)
    proj_near = jnp.stack([pts_near[:, 0] * fx / pts_near[:, 2] + cx,
                           pts_near[:, 1] * fy / pts_near[:, 2] + cy], -1)
    d_mask = ((proj_near[:, 0] > 0) & (proj_near[:, 0] < W)
              & (proj_near[:, 1] > 0) & (proj_near[:, 1] < H)
              & (pts_near[:, 2] > 0.1))
    map_z = bilinear_sample_border(near_plane_depth[None], proj_near)[0]

    # back-project with the nearest cam's surface depth and return (:343-355)
    pts_near_surf = pts_near / pts_near[:, 2:3] * map_z[:, None]
    pts_world2 = jnp.matmul(pts_near_surf - tn, Rn, precision=_HI)
    pts_view2 = jnp.matmul(pts_world2, Rv.T, precision=_HI) + tv
    proj_back = jnp.stack([pts_view2[:, 0] * fx / pts_view2[:, 2] + cx,
                           pts_view2[:, 1] * fy / pts_view2[:, 2] + cy], -1)

    ix = jnp.arange(W, dtype=jnp.float32)
    iy = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(ix, iy, indexing='xy')
    pixels = jnp.stack([gx, gy], -1).reshape(-1, 2)
    diff = proj_back - pixels
    pixel_noise = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-16))

    if not wo_geo_occ_aware:
        d_mask = d_mask & (pixel_noise < pixel_noise_th)
        weights = jax.lax.stop_gradient(1.0 / jnp.exp(pixel_noise))
    else:
        weights = jnp.ones_like(pixel_noise)
    weights = jnp.where(d_mask, weights, 0.0)

    n_valid = jnp.sum(d_mask)
    geo_loss = geo_weight * jnp.sum(weights * pixel_noise) / jnp.maximum(n_valid, 1)

    if not compute_ncc:
        return MultiViewOut(geo_loss=geo_loss, ncc_loss=jnp.zeros(()), n_valid=n_valid)

    # ---- LNCC photometric loss (:385-444)
    npx = H * W
    take = min(sample_num, npx)
    sel = jax.random.permutation(key, npx)[:take]
    sel_w = weights[sel]
    sel_pix = pixels[sel]

    if ncc_dense:
        # per-pixel plane homography applied at the pixel's own location,
        # over an r-extended pixel grid so border windows see the same
        # out-of-image warps as the reference's gathered patches (whose
        # offsets run past the border and are warped, THEN border-clamped)
        r = patch_size
        He, We = H + 2 * r, W + 2 * r
        R_rel = jnp.matmul(Rn, Rv.T, precision=_HI)
        t_rel = -jnp.matmul(R_rel, tv, precision=_HI) + tn
        ne = jnp.pad(rendered_normal, ((0, 0), (r, r), (r, r)), mode='edge')
        de = jnp.pad(rendered_distance, r, mode='edge')
        n_all = ne.reshape(3, -1).T                              # [HeWe,3]
        d_all = de.reshape(-1)
        exi = jnp.arange(We, dtype=jnp.float32) - r
        eyi = jnp.arange(He, dtype=jnp.float32) - r
        egx, egy = jnp.meshgrid(exi, eyi, indexing='xy')
        epix = jnp.stack([egx, egy], -1).reshape(-1, 2)
        # per-pixel homography composed EXACTLY as the patch branch does
        # (K @ (R_rel - t n^T/d) @ Kinv, then applied to [x,y,1]) so that on
        # a patch-constant plane the warp coordinates — and their gradients —
        # are bitwise-identical to the gathered-patch form
        Kinv = jnp.linalg.inv(K)
        Hmat = (R_rel[None] - t_rel[None, :, None] * n_all[:, None, :]
                / (d_all[:, None, None] + 1e-12))                # [HeWe,3,3]
        Hmat = jnp.matmul(jnp.matmul(K[None], Hmat, precision=_HI),
                          Kinv[None], precision=_HI)
        homo = jnp.concatenate([epix, jnp.ones((He * We, 1))], -1)
        warped = jnp.einsum('pij,pj->pi', Hmat, homo, precision=_HI)
        wxy = warped[:, :2] / (warped[:, 2:] + 1e-10)
        near_warp = bilinear_sample_border(near_gt_gray, wxy)[0]
        ref_ext = bilinear_sample_border(
            gt_gray, epix).reshape(He, We)                       # clamped
        ncc_map, mask_map = _lncc_dense(
            jax.lax.stop_gradient(ref_ext), near_warp.reshape(He, We),
            patch_size)
        ncc_v = ncc_map.reshape(-1)[sel]
        m = mask_map.reshape(-1)[sel] & (sel_w > 0)
        ncc = ncc_v * sel_w
        ncc_loss = (ncc_weight * jnp.sum(jnp.where(m, ncc, 0.0))
                    / jnp.maximum(jnp.sum(m), 1))
        return MultiViewOut(geo_loss=geo_loss, ncc_loss=ncc_loss,
                            n_valid=n_valid)

    ps = 2 * patch_size + 1
    offs = jnp.stack(jnp.meshgrid(jnp.arange(-patch_size, patch_size + 1, dtype=jnp.float32),
                                  jnp.arange(-patch_size, patch_size + 1, dtype=jnp.float32),
                                  indexing='xy')[::-1], -1).reshape(-1, 2)
    # NOTE graphics_utils.patch_offsets stacks (y,x)[::-1] -> (x,y)
    patch_pix = sel_pix[:, None, :] + offs[None, :, :]      # [S, ps*ps, 2]
    ref_gray = bilinear_sample_border(gt_gray, patch_pix.reshape(-1, 2))
    ref_gray = ref_gray.reshape(take, ps * ps)

    # homography view->near per sampled pixel (:409-427)
    R_rel = jnp.matmul(Rn, Rv.T, precision=_HI)
    t_rel = -jnp.matmul(R_rel, tv, precision=_HI) + tn
    n_local = rendered_normal.reshape(3, -1).T[sel]          # [S,3]
    d_local = rendered_distance.reshape(-1)[sel]
    Hmat = (R_rel[None] - t_rel[None, :, None] * n_local[:, None, :]
            / (d_local[:, None, None] + 1e-12))
    Kinv = jnp.linalg.inv(K)
    Hmat = jnp.matmul(jnp.matmul(K[None], Hmat, precision=_HI),
                      Kinv[None], precision=_HI)

    ones = jnp.ones((take, ps * ps, 1))
    homo = jnp.concatenate([patch_pix, ones], -1)            # [S,pp,3]
    warped = jnp.einsum('sij,spj->spi', Hmat, homo, precision=_HI)
    warped = warped[..., :2] / (warped[..., 2:] + 1e-10)
    near_gray = bilinear_sample_border(near_gt_gray, warped.reshape(-1, 2))
    near_gray = near_gray.reshape(take, ps * ps)

    ncc_vals, ncc_mask = lncc(jax.lax.stop_gradient(ref_gray), near_gray)
    m = ncc_mask[:, 0] & (sel_w > 0)
    ncc = ncc_vals[:, 0] * sel_w
    ncc_loss = ncc_weight * jnp.sum(jnp.where(m, ncc, 0.0)) / jnp.maximum(jnp.sum(m), 1)
    return MultiViewOut(geo_loss=geo_loss, ncc_loss=ncc_loss, n_valid=n_valid)
