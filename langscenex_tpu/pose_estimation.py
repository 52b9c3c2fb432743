"""Pose estimation stage: VGGT feed-forward init + alternatives.

Parity target: field_construction/pose_estimator/__init__.py —
get_pose_estimator factory (:296-303), VGGTEstimator (:227-294, the
default), ColmapEstimator (:25-96 shells out to the colmap binary). The
MASt3R/CUT3R external-package paths are represented by the same npz/ply
output contract (utils/sfm_utils.py writers live in scene/colmap_io.py).
"""
from __future__ import annotations

import logging
import os


import numpy as np

log = logging.getLogger(__name__)


def estimate_poses_vggt(data_path: str, params=None, cfg=None,
                        target_wh=(720, 480)) -> None:
    """Run VGGT over data_path/input frames; write per-view
    camera/%04d.npz {pose (c2w), intrinsics} and points3D.ply from the
    first+last frames' unprojected depth (pose_estimator/__init__.py:
    232-294: intrinsics rescaled to 720x480, only first/last frame points
    kept for the init cloud).

    Without pretrained weights (none are downloadable in this environment)
    ``params`` must be supplied; tests drive this with a tiny random VGGT.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from .models.vggt import (VGGT, VGGTConfig,
                              pose_encoding_to_extri_intri,
                              unproject_depth_to_points)
    from .scene.dataset_readers import write_ply_points

    cfg = cfg or VGGTConfig()
    model = VGGT(cfg)
    input_dir = os.path.join(data_path, "input")
    names = sorted(n for n in os.listdir(input_dir)
                   if n.endswith((".png", ".jpg")))
    imgs = []
    S = cfg.img_size - cfg.img_size % cfg.patch_size
    for n in names:
        im = Image.open(os.path.join(input_dir, n)).convert("RGB")
        im = im.resize((S, S))
        imgs.append(np.asarray(im, np.float32).transpose(2, 0, 1) / 255.0)
    batch = jnp.asarray(np.stack(imgs))[None]

    if params is None:
        raise ValueError(
            "VGGT weights required: pass converted facebook/VGGT-1B params "
            "(pose_estimator loads them from HF hub in the reference)")

    out = model.apply(params, batch)
    H, W = batch.shape[-2:]
    extri, K = pose_encoding_to_extri_intri(out["pose_enc"][0], (H, W))
    depth = out["depth"][0]

    # rescale intrinsics to the target video resolution (:268-272)
    tw, th = target_wh
    scale_x, scale_y = tw / W, th / H
    Ks = np.array(K)      # copy: np.asarray of a jax array is read-only
    Ks[:, 0] *= scale_x
    Ks[:, 1] *= scale_y

    cam_dir = os.path.join(data_path, "camera")
    os.makedirs(cam_dir, exist_ok=True)
    n_frames = len(names)
    for i in range(n_frames):
        E = np.eye(4, dtype=np.float32)
        E[:3] = np.asarray(extri[i])
        pose_c2w = np.linalg.inv(E)
        np.savez(os.path.join(cam_dir, f"{i + 1:04d}.npz"),
                 pose=pose_c2w, intrinsics=Ks[i])

    # init cloud from first+last frames only (:274-278)
    pts = []
    for i in (0, n_frames - 1):
        p = unproject_depth_to_points(depth[i], extri[i], K[i])
        pts.append(np.asarray(p).reshape(-1, 3))
    pts = np.concatenate(pts, 0)
    cols = np.concatenate([imgs[0].transpose(1, 2, 0).reshape(-1, 3),
                           imgs[-1].transpose(1, 2, 0).reshape(-1, 3)], 0)
    # subsample for a manageable init cloud
    stride = max(len(pts) // 200_000, 1)
    write_ply_points(os.path.join(data_path, "points3D.ply"),
                     pts[::stride], cols[::stride])


def estimate_poses_colmap(data_path: str, colmap_bin: str = "colmap") -> None:
    """Shell out to COLMAP (ColmapEstimator :25-96): feature_extractor ->
    exhaustive_matcher -> mapper -> image_undistorter."""
    import shutil
    import subprocess
    if shutil.which(colmap_bin) is None:
        raise RuntimeError("colmap binary not available")
    db = os.path.join(data_path, "database.db")
    sparse = os.path.join(data_path, "sparse")
    os.makedirs(sparse, exist_ok=True)
    run = lambda *a: subprocess.run(list(a), check=True, capture_output=True)
    run(colmap_bin, "feature_extractor", "--database_path", db,
        "--image_path", os.path.join(data_path, "input"))
    run(colmap_bin, "exhaustive_matcher", "--database_path", db)
    run(colmap_bin, "mapper", "--database_path", db,
        "--image_path", os.path.join(data_path, "input"),
        "--output_path", sparse)


ESTIMATORS = {
    "vggt": estimate_poses_vggt,
    "colmap": estimate_poses_colmap,
}


def get_pose_estimator(name: str):
    """Factory (pose_estimator/__init__.py:296-303)."""
    if name not in ESTIMATORS:
        raise ValueError(f"unknown pose estimator {name!r}; "
                         f"have {sorted(ESTIMATORS)}")
    return ESTIMATORS[name]
