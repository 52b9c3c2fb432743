"""SfM helpers: co-visibility masks, image sizing, COLMAP-dir export.

Parity target: utils/sfm_utils.py — load/resize images to 512-multiples
(:125), COLMAP sparse writers (save_extrinsic:205, save_intrinsics:230,
save_points3D:253 — covered by scene/colmap_io writers), and the
co-visibility masks for the MASt3R/CUT3R paths (compute_co_vis_masks:378:
project each view's depth points into the others and mark pixels whose
depth is corroborated).

Deliberately omitted from the reference's 512 LoC: the MASt3R-specific
tensor glue (init_filestructure's wandb dirs, round_python3, rigid_points
alignment duplicated from utils_poses), focal-estimation helpers used
only by the MASt3R/CUT3R *external-package* paths, and matplotlib
visualization — the pipeline-relevant surface (sizing rule, COLMAP
writers, co-visibility) is complete here + scene/colmap_io.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def round_to_multiple(x: int, m: int = 16) -> int:
    return max(m, (x // m) * m)


def resize_to_512(w: int, h: int) -> Tuple[int, int]:
    """Long side to 512, both sides multiples of 16 (sfm_utils.load_images
    :125 sizing rule)."""
    scale = 512.0 / max(w, h)
    return round_to_multiple(int(w * scale)), round_to_multiple(int(h * scale))


def project_points(pts_world: np.ndarray, K: np.ndarray,
                   w2c: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[N,3] world -> ([N,2] pixels, [N] depth)."""
    cam = pts_world @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    u = cam[:, 0] / np.maximum(z, 1e-8) * K[0, 0] + K[0, 2]
    v = cam[:, 1] / np.maximum(z, 1e-8) * K[1, 1] + K[1, 2]
    return np.stack([u, v], -1), z


def compute_co_vis_masks(depths: List[np.ndarray], Ks: List[np.ndarray],
                         w2cs: List[np.ndarray],
                         depth_tol: float = 0.05) -> List[np.ndarray]:
    """Per view: mask of pixels whose unprojected point is seen (depth-
    consistent within tol, relative) by at least one OTHER view
    (sfm_utils.compute_co_vis_masks:378 semantics)."""
    n = len(depths)
    pts_all = []
    for i in range(n):
        H, W = depths[i].shape
        ys, xs = np.mgrid[0:H, 0:W]
        z = depths[i]
        K = Ks[i]
        x_cam = (xs - K[0, 2]) / K[0, 0] * z
        y_cam = (ys - K[1, 2]) / K[1, 1] * z
        cam = np.stack([x_cam, y_cam, z], -1).reshape(-1, 3)
        R = w2cs[i][:3, :3]
        t = w2cs[i][:3, 3]
        pts_all.append((cam - t) @ R)
    masks = []
    for i in range(n):
        H, W = depths[i].shape
        vis = np.zeros(H * W, bool)
        for j in range(n):
            if j == i:
                continue
            uv, z = project_points(pts_all[i], Ks[j], w2cs[j])
            Hj, Wj = depths[j].shape
            ui = np.round(uv[:, 0]).astype(int)
            vi = np.round(uv[:, 1]).astype(int)
            ok = (z > 0) & (ui >= 0) & (ui < Wj) & (vi >= 0) & (vi < Hj)
            dj = np.zeros_like(z)
            dj[ok] = depths[j][vi[ok], ui[ok]]
            consistent = ok & (np.abs(dj - z) < depth_tol * np.maximum(z, 1e-6))
            vis |= consistent
        masks.append(vis.reshape(H, W))
    return masks
