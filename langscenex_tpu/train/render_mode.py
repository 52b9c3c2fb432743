"""Render mode + eval mode (entry_point.py modes 'render' / 'eval').

Parity targets: GaussianField.render (gaussian_field.py:605-865): load a
PLY snapshot, render every training camera's RGB / depth / normal /
language / instance maps, TSDF-fuse depth into a mesh, globally normalize
feature maps and write PCA colormap visualizations, plus a second
feature-TSDF mesh; and GaussianField.eval (:870-971): per test camera,
freeze splats and optimize only that camera's pose for 100 iters against
RGB L1+SSIM before rendering.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import losses as L
from ..ops.rasterize import RasterConfig
from ..ops.quat import tensor_from_camera
from ..ops.tsdf import (create_volume, integrate, extract_mesh,
                        post_process_mesh, save_mesh_ply)
from ..scene.cameras import Camera
from ..scene.gaussians import GaussianState
from .field import render_view


def pca_colormap(feat: np.ndarray) -> np.ndarray:
    """[C,H,W] features -> [3,H,W] PCA visualization in [0,1]
    (cogvideox_interpolation/utils/colormaps.apply_pca_colormap:180
    behavior: project to top-3 PCs, robust-normalize)."""
    C, H, W = feat.shape
    x = feat.reshape(C, -1).T
    x = x - x.mean(0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[:3].T
    lo = np.percentile(proj, 2, axis=0)
    hi = np.percentile(proj, 98, axis=0)
    proj = np.clip((proj - lo) / np.maximum(hi - lo, 1e-8), 0, 1)
    return proj.T.reshape(3, H, W)


def render_all_views(splats: GaussianState, cams: List[Camera],
                     rcfg: RasterConfig, sh_degree: int = 3,
                     bg: Optional[jnp.ndarray] = None,
                     include_feature: bool = True):
    """Yield (camera, dict of rendered maps) per camera
    (gaussian_field.py:651-705)."""
    bg = jnp.zeros(3) if bg is None else bg
    rfn = jax.jit(lambda w2c: render_view(
        splats, None, w2c, cams[0].raster_camera(), bg, sh_degree,
        include_feature, True, None, rcfg))
    for cam in cams:
        out = rfn(jnp.asarray(cam.w2c))
        maps = {
            "render": np.asarray(out.color),
            "plane_depth": np.asarray(out.plane_depth),
            "rendered_normal": np.asarray(out.all_map[:3]),
            "alpha": np.asarray(out.all_map[3]),
        }
        if include_feature:
            maps["language_feature"] = np.asarray(out.language)
            maps["instance_feature"] = np.asarray(out.instance)
        yield cam, maps


def render_result(splats: GaussianState, cams: List[Camera], out_dir: str,
                  rcfg: RasterConfig = RasterConfig(), sh_degree: int = 3,
                  voxel_size: float = 0.01, mesh: bool = True,
                  feature_mesh: bool = True) -> None:
    """Full render mode (gaussian_field.py:605-865)."""
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    all_depths, all_maps = [], []
    lang_maps = []
    for cam, maps in render_all_views(splats, cams, rcfg, sh_degree):
        name = cam.image_name or f"{cam.uid:04d}"
        img = np.clip(maps["render"].transpose(1, 2, 0), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{name}_render.png"))
        d = maps["plane_depth"]
        dn = (d - d.min()) / max(d.max() - d.min(), 1e-8)
        Image.fromarray((dn * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{name}_depth.png"))
        nrm = np.clip((maps["rendered_normal"].transpose(1, 2, 0) + 1) / 2, 0, 1)
        Image.fromarray((nrm * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{name}_normal.png"))
        if "language_feature" in maps:
            lang_maps.append((name, maps["language_feature"]))
            np.save(os.path.join(out_dir, f"{name}_language.npy"),
                    maps["language_feature"])
        all_depths.append((cam, maps))

    # global min/max normalize + PCA colormaps (:757-818)
    if lang_maps:
        stack = np.stack([m for _, m in lang_maps])
        lo, hi = stack.min(), stack.max()
        for name, m in lang_maps:
            mn = (m - lo) / max(hi - lo, 1e-8)
            vis = pca_colormap(mn)
            Image.fromarray(
                (vis.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{name}_language_pca.png"))

    if mesh and all_depths:
        _fuse_and_save(all_depths, "render", out_dir, "mesh.ply", voxel_size)
    if feature_mesh and all_depths and lang_maps:
        _fuse_and_save(all_depths, "language_feature", out_dir,
                       "feature_mesh.ply", voxel_size)


def _fuse_and_save(view_maps, color_key, out_dir, name, voxel_size):
    """TSDF-fuse plane depths with a chosen color channel into a mesh
    (:707-740 and :836-865)."""
    cams = [c for c, _ in view_maps]
    centers = np.stack([c.cam_center for c in cams])
    lo = centers.min(0) - 2.0
    hi = centers.max(0) + 2.0
    dims = np.minimum(((hi - lo) / voxel_size).astype(int) + 1, 192)
    vs = float(np.max((hi - lo) / np.maximum(dims, 1)))
    vol = create_volume(lo, vs, tuple(int(d) for d in dims))
    def _step(vol_t, vol_w, vol_c, d, K, w2c, col):
        nv = integrate(
            dataclasses.replace(vol, tsdf=vol_t, weight=vol_w, color=vol_c),
            d, K, w2c, col, trunc=4 * vs)
        return nv.tsdf, nv.weight, nv.color
    step = jax.jit(_step)
    t, w, c = vol.tsdf, vol.weight, vol.color
    for cam, maps in view_maps:
        col = maps.get(color_key, maps["render"])
        t, w, c = step(t, w, c, jnp.asarray(maps["plane_depth"]),
                       jnp.asarray(cam.K()), jnp.asarray(cam.w2c),
                       jnp.asarray(col[:3]))
    vol = dataclasses.replace(vol, tsdf=t, weight=w, color=c)
    verts, faces, cols = extract_mesh(vol)
    save_mesh_ply(os.path.join(out_dir, name), verts, faces, cols)
    # floater/cluster filtering pass (gaussian_field.py:738-740 writes
    # both tsdf_fusion.ply and tsdf_fusion_post.ply)
    pverts, pfaces, pcols = post_process_mesh(verts, faces, cols)
    stem, ext = os.path.splitext(name)
    save_mesh_ply(os.path.join(out_dir, stem + "_post" + ext),
                  pverts, pfaces, pcols)


def eval_result(splats: GaussianState, test_cams: List[Camera],
                out_dir: str, rcfg: RasterConfig = RasterConfig(),
                sh_degree: int = 3, pose_optim_iters: int = 100):
    """Eval mode with the reference's full artifact tree
    (gaussian_field.py:892-971): out_dir/eval/{renders_rgb (render|gt
    side-by-side), renders_lang, renders_instance, renders_lang_npy,
    renders_instance_npy (HWC float npys), renders_depth,
    renders_depth_npy, renders_normal} per test view, after the 100-iter
    pose-only fit. Returns the per-view PSNR list."""
    import os

    from PIL import Image
    base = os.path.join(out_dir, "eval")
    dirs = ["renders_rgb", "renders_depth", "renders_depth_npy",
            "renders_normal", "renders_lang", "renders_instance",
            "renders_lang_npy", "renders_instance_npy"]
    for d in dirs:
        os.makedirs(os.path.join(base, d), exist_ok=True)

    def save_png(path, chw):
        x = np.clip(np.asarray(chw), 0, 1)
        if x.ndim == 2:
            x = x[None]
        arr = (x.transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(arr.squeeze() if arr.shape[-1] == 1 else arr
                        ).save(path)

    results = []
    for cam, pose, maps, psnr in eval_views(
            splats, test_cams, rcfg, sh_degree, pose_optim_iters):
        name = cam.image_name or f"{cam.uid:04d}"
        gt, _ = cam.load_image()
        side = np.concatenate(
            [np.clip(maps["render"], 0, 1), np.clip(gt, 0, 1)], axis=2)
        save_png(os.path.join(base, "renders_rgb", name + ".png"), side)
        for key, dpng, dnpy in (
                ("language_feature", "renders_lang", "renders_lang_npy"),
                ("instance_feature", "renders_instance",
                 "renders_instance_npy")):
            feat = maps[key]
            np.save(os.path.join(base, dnpy, name + ".npy"),
                    feat.transpose(1, 2, 0))
            save_png(os.path.join(base, dpng, name + ".png"),
                     pca_colormap(
                         (feat - feat.min())
                         / max(feat.max() - feat.min(), 1e-8)))
        if maps.get("plane_depth") is not None:
            d = maps["plane_depth"]
            np.save(os.path.join(base, "renders_depth_npy", name + ".npy"),
                    d)
            save_png(os.path.join(base, "renders_depth", name + ".png"),
                     (d - d.min()) / max(d.max() - d.min(), 1e-8))
        if maps.get("rendered_normal") is not None:
            save_png(os.path.join(base, "renders_normal", name + ".png"),
                     (maps["rendered_normal"] + 1.0) * 0.5)
        results.append({"camera": name, "psnr": psnr,
                        "pose": pose.tolist()})
    return results


def eval_views(splats: GaussianState, test_cams: List[Camera],
               rcfg: RasterConfig = RasterConfig(), sh_degree: int = 3,
               pose_optim_iters: int = 100, lr: float = 1e-3,
               lambda_dssim: float = 0.2):
    """Novel-view eval protocol (gaussian_field.py:870-971): per test
    camera, optimize ONLY its pose (splats frozen) against RGB L1+SSIM,
    then render. Yields (camera, optimized_pose_qt, maps, psnr)."""
    bg = jnp.zeros(3)
    proxy = test_cams[0].raster_camera()

    def loss_fn(pose, gt):
        out = render_view(splats, pose, jnp.eye(4), proxy, bg, sh_degree,
                          False, False, None, rcfg)
        l1 = L.l1_loss(out.color, gt)
        ssim_v = L.ssim(out.color, gt)
        return (1 - lambda_dssim) * l1 + lambda_dssim * (1 - ssim_v)

    tx = optax.adam(lr)

    @jax.jit
    def step(pose, opt_state, gt):
        loss, g = jax.value_and_grad(loss_fn)(pose, gt)
        upd, opt_state = tx.update(g, opt_state, pose)
        return optax.apply_updates(pose, upd), opt_state, loss

    rfn = jax.jit(lambda pose: render_view(
        splats, pose, jnp.eye(4), proxy, bg, sh_degree, True, True, None,
        rcfg))

    for cam in test_cams:
        gt, _ = cam.load_image()
        gt = jnp.asarray(gt)
        pose = jnp.asarray(tensor_from_camera(jnp.asarray(cam.w2c)))
        opt_state = tx.init(pose)
        for _ in range(pose_optim_iters):
            pose, opt_state, loss = step(pose, opt_state, gt)
        out = rfn(pose)
        mse = float(jnp.mean((out.color - gt) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        maps = {"render": np.asarray(out.color),
                "language_feature": np.asarray(out.language),
                "instance_feature": np.asarray(out.instance),
                "plane_depth": np.asarray(out.plane_depth),
                "rendered_normal": np.asarray(out.all_map[:3])}
        yield cam, np.asarray(pose), maps, psnr
