import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.ops.rasterize import RasterConfig
from langscenex_tpu.ops.tsdf import (create_volume, integrate, extract_mesh,
                                     post_process_mesh, save_mesh_ply)
from langscenex_tpu.scene.gaussians import create_from_points
from langscenex_tpu.scene.ply_io import save_ply, load_ply
from langscenex_tpu.train.render_mode import (render_result, eval_views,
                                              pca_colormap)
from test_train import make_cams, gt_scene, render_gt_images, RCFG
from langscenex_tpu.scene.cameras import rgb_to_gray


class TestTSDF:
    def test_flat_wall(self):
        """A fronto-parallel wall at z=2 integrated from one view gives a
        zero crossing near z=2."""
        vol = create_volume([-1, -1, 1], 0.05, (40, 40, 40))
        K = jnp.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        depth = jnp.full((64, 64), 2.0)
        color = jnp.ones((3, 64, 64)) * 0.5
        vol = integrate(vol, depth, K, jnp.eye(4), color, trunc=0.2)
        verts, faces, cols = extract_mesh(vol)
        assert len(verts) > 0 and len(faces) > 0
        # surface z within a voxel of 2.0
        assert abs(np.median(verts[:, 2]) - 2.0) < 0.1
        np.testing.assert_allclose(np.median(cols), 0.5, atol=0.05)

    def test_post_process_mesh_drops_floaters(self):
        """A 100-triangle fan plus a disconnected 1-triangle floater: the
        floater's cluster (<50 tris) is removed, the fan survives, and
        unreferenced vertices are compacted (gaussian_field.py:43-63)."""
        rng = np.random.default_rng(0)
        n = 100
        # fan: vertices 0..n around center vertex n
        verts = np.concatenate([rng.normal(size=(n + 1, 3)),
                                100 + rng.normal(size=(3, 3))]).astype(
            np.float32)
        fan = np.stack([np.full(n, n), np.arange(n),
                        (np.arange(n) + 1) % n], 1)
        floater = np.array([[n + 1, n + 2, n + 3]])
        faces = np.concatenate([fan, floater]).astype(np.int32)
        cols = np.ones((len(verts), 3), np.float32)
        pv, pf, pc = post_process_mesh(verts, faces, cols, cluster_to_keep=3)
        assert len(pf) == n                      # floater removed
        assert len(pv) == n + 1                  # its verts compacted away
        assert pc.shape == (n + 1, 3)
        assert pf.max() < len(pv)
        # degenerate triangle is dropped too
        deg = np.array([[0, 0, 1]], np.int32)
        pv2, pf2, _ = post_process_mesh(verts, np.concatenate([fan, deg]),
                                        None, cluster_to_keep=1)
        assert len(pf2) == n

    def test_mesh_ply_roundtrip(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        save_mesh_ply(str(tmp_path / "m.ply"), verts, faces, cols)
        assert (tmp_path / "m.ply").stat().st_size > 0


class TestPCA:
    def test_shape_and_range(self):
        rng = np.random.default_rng(0)
        feat = rng.normal(size=(3, 16, 20)).astype(np.float32)
        vis = pca_colormap(feat)
        assert vis.shape == (3, 16, 20)
        assert vis.min() >= 0 and vis.max() <= 1


class TestRenderMode:
    def test_render_result_writes_outputs(self, tmp_path):
        cams = make_cams(n=2)
        pts, colors = gt_scene(P=30)
        imgs = render_gt_images(cams, pts, colors)
        for c, img in zip(cams, imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        splats = create_from_points(pts, colors, capacity=32)
        render_result(splats, cams, str(tmp_path), rcfg=RCFG, sh_degree=0,
                      mesh=True, feature_mesh=False)
        files = os.listdir(tmp_path)
        assert any(f.endswith("_render.png") for f in files)
        assert any(f.endswith("_depth.png") for f in files)
        assert any(f.endswith("_language_pca.png") for f in files)
        assert "mesh.ply" in files

    def test_eval_pose_optim_improves(self, tmp_path):
        cams = make_cams(n=2)
        pts, colors = gt_scene(P=40)
        imgs = render_gt_images(cams, pts, colors)
        for c, img in zip(cams, imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        splats = create_from_points(pts, colors, capacity=64)
        # perturb the test camera's stored pose; eval should recover some
        cam = cams[0]
        results = list(eval_views(splats, [cam], rcfg=RCFG, sh_degree=0,
                                  pose_optim_iters=10))
        assert len(results) == 1
        _, pose, maps, psnr = results[0]
        assert np.isfinite(psnr)
        assert maps["render"].shape[0] == 3


class TestEvalArtifacts:
    def test_eval_result_artifact_tree(self, tmp_path):
        """eval_result writes the reference's eval/ artifact tree
        (gaussian_field.py:892-971): side-by-side rgb, lang/instance
        PNGs + HWC npys, depth + normal maps."""
        from langscenex_tpu.train.render_mode import eval_result
        cams = make_cams(n=1)
        pts, colors = gt_scene(P=30)
        imgs = render_gt_images(cams, pts, colors)
        for c, img in zip(cams, imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        splats = create_from_points(pts, colors, capacity=32)
        results = eval_result(splats, cams, str(tmp_path), rcfg=RCFG,
                              sh_degree=0, pose_optim_iters=2)
        assert len(results) == 1 and np.isfinite(results[0]["psnr"])
        base = tmp_path / "eval"
        name = cams[0].image_name or f"{cams[0].uid:04d}"
        for d, ext in [("renders_rgb", ".png"), ("renders_lang", ".png"),
                       ("renders_instance", ".png"),
                       ("renders_lang_npy", ".npy"),
                       ("renders_instance_npy", ".npy"),
                       ("renders_depth", ".png"),
                       ("renders_depth_npy", ".npy"),
                       ("renders_normal", ".png")]:
            assert (base / d / (name + ext)).exists(), d
        lang = np.load(base / "renders_lang_npy" / (name + ".npy"))
        assert lang.shape[-1] == 3 and lang.ndim == 3  # HWC contract
