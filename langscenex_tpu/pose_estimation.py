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


def estimate_poses_dense_init(data_path: str, params=None, cfg=None,
                              n_views=None, co_vis_dsp: bool = True,
                              depth_thre: float = 0.1,
                              max_pts_num: int = 1_500_000) -> None:
    """MASt3R/CUT3R-contract COLMAP export (pose_estimator/__init__.py:
    99-225): dense per-view pointmaps + confidences -> confidence-ordered
    redundancy masks -> sparse/0/{images,cameras}.{bin,txt} +
    points3D.ply + confidence(_dsp).npy + pts_num.txt.

    TPU-first design note: the reference reaches this contract through
    the external mast3r/cut3r torch packages (not installable here); we
    reach the identical artifact tree through our native VGGT (which
    predicts the same quantities: pose, intrinsics, depth, confidence).
    The export machinery below IS the reference's first-party code path
    (utils/sfm_utils.py writers).
    """
    import jax.numpy as jnp
    from PIL import Image

    from .models.vggt import (VGGT, VGGTConfig, pose_encoding_to_extri_intri,
                              unproject_depth_to_points)
    from .utils import sfm

    cfg = cfg or VGGTConfig()
    model = VGGT(cfg)
    if params is None:
        raise ValueError(
            "dense-init weights required: pass converted VGGT params")

    image_files, suffix = sfm.get_sorted_image_files(
        os.path.join(data_path, "input"))
    S = cfg.img_size - cfg.img_size % cfg.patch_size
    imgs = []
    org_shape = None
    for f in image_files:
        im = Image.open(f).convert("RGB")
        if org_shape is None:
            org_shape = im.size
        imgs.append(np.asarray(im.resize((S, S)),
                               np.float32).transpose(2, 0, 1) / 255.0)
    batch = jnp.asarray(np.stack(imgs))[None]
    out = model.apply(params, batch)

    H, W = batch.shape[-2:]
    extri, K = pose_encoding_to_extri_intri(out["pose_enc"][0], (H, W))
    extri = np.asarray(extri)
    K = np.asarray(K)
    depth = np.asarray(out["depth"][0])
    conf = np.asarray(out["depth_conf"][0])
    n = len(image_files)

    w2cs = np.tile(np.eye(4), (n, 1, 1))
    w2cs[:, :3] = extri
    pointmaps = np.stack([
        np.asarray(unproject_depth_to_points(
            jnp.asarray(depth[i]), jnp.asarray(extri[i]), jnp.asarray(K[i])))
        for i in range(n)])

    order = np.argsort(conf.reshape(n, -1).mean(-1))[::-1]
    if depth_thre > 0:
        masks = ~sfm.compute_redundancy_masks(
            order, depth, pointmaps, K, w2cs, (n, H, W),
            depth_threshold=depth_thre)
    else:
        co_vis_dsp, masks = False, None

    _, sparse_0, _ = sfm.init_filestructure(data_path, n_views)
    colors = np.stack(imgs).transpose(0, 2, 3, 1)
    focals = K[:, 0, 0]
    sfm.save_extrinsic(sparse_0, w2cs, image_files, suffix)
    sfm.save_intrinsics(sparse_0, focals, org_shape, (n, H, W),
                        save_focals=True)
    n_pts = sfm.save_points3D(sparse_0, colors, pointmaps,
                              conf.reshape(n, -1), masks,
                              use_masks=co_vis_dsp, save_all_pts=False,
                              save_txt_path=data_path,
                              depth_threshold=depth_thre,
                              max_pts_num=max_pts_num)
    log.info("dense-init export: %d points -> %s", n_pts, sparse_0)


ESTIMATORS = {
    "vggt": estimate_poses_vggt,
    "colmap": estimate_poses_colmap,
    # the reference reaches these two through external torch packages;
    # both resolve to the same COLMAP-export contract served natively
    "mast3r": estimate_poses_dense_init,
    "cut3r": estimate_poses_dense_init,
}


def get_pose_estimator(name: str):
    """Factory (pose_estimator/__init__.py:296-303)."""
    if name not in ESTIMATORS:
        raise ValueError(f"unknown pose estimator {name!r}; "
                         f"have {sorted(ESTIMATORS)}")
    return ESTIMATORS[name]
