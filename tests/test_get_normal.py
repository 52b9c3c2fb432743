"""get_normal stage: depth-derived normal keyframes (the documented
StableNormal substitute) + measured geometry-phase impact of the prior."""
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from test_train import make_cams, gt_scene, render_gt_images, RCFG
from langscenex_tpu.scene.cameras import rgb_to_gray
from langscenex_tpu.scene.gaussians import create_from_points
from langscenex_tpu.utils.config import OptimizationConfig


class TestGenerateNormals:
    def test_writes_normal_keyframes(self, tmp_path):
        from PIL import Image

        from langscenex_tpu.get_normal import generate_normals
        from langscenex_tpu.models.vggt import VGGT, VGGTConfig

        cfg = VGGTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                         num_heads=2, num_register_tokens=2,
                         vit_embed_dim=32, vit_depth=2, vit_num_heads=2,
                         camera_trunk_depth=1, camera_iterations=2,
                         intermediate_layers=(0, 0, 1, 1),
                         dpt_features=16, dpt_out_channels=(16, 16, 16, 16),
                         enable_point_head=False)
        params = VGGT(cfg).init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 1, 3, 28, 28)))
        os.makedirs(tmp_path / "rgb")
        rng = np.random.default_rng(0)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (40, 60, 3), np.uint8)
                            ).save(tmp_path / "rgb" / f"{i + 1:04d}.png")
        generate_normals(str(tmp_path), params=params, cfg=cfg)
        for i in range(2):
            p = tmp_path / "normal" / f"{i + 1:04d}.png"
            assert p.exists()
            arr = np.asarray(Image.open(p))
            assert arr.shape == (40, 60, 3)   # native keyframe size

    def test_normal_prior_impact(self):
        """Measured substitution impact (VERDICT item 10): training the
        geometry phase WITH a depth-derived normal prior must reduce the
        rendered-normal error vs the same run without it. The prior is the
        substitute's signal: world-rotated normals derived from the TRUE
        scene's rendered depth (exactly what get_normal produces from the
        VGGT depth head)."""
        from langscenex_tpu.ops.depth_normal import (depth_to_points_cam,
                                                     points_to_normals)
        from langscenex_tpu.train.field import (GaussianFieldTrainer,
                                                render_view)

        cams = make_cams(n=3)
        # smooth tilted plane: depth-derived normals are informative here
        # (the substitute's operating regime — real scenes are piecewise
        # smooth surfaces)
        rng0 = np.random.default_rng(3)
        u = rng0.uniform(-1.5, 1.5, (60, 1)).astype(np.float32)
        v = rng0.uniform(-1.0, 1.0, (60, 1)).astype(np.float32)
        pts = np.concatenate([u, v, 0.3 * u + 0.15 * v], 1)
        colors = rng0.uniform(0.2, 1.0, (60, 3)).astype(np.float32)
        imgs = render_gt_images(cams, pts, colors)
        gt_splats = create_from_points(pts, colors, capacity=64)
        bg = jnp.zeros(3)
        priors = {}
        for c, img in zip(cams, imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
            out = render_view(gt_splats, None, jnp.asarray(c.w2c),
                              c.raster_camera(), bg, 0, False, True,
                              None, RCFG)
            p = depth_to_points_cam(out.plane_depth, jnp.asarray(c.K()))
            n_cam = np.asarray(points_to_normals(p))      # [H,W,3]
            w2c = np.asarray(c.w2c)
            n_world = np.einsum('ij,hwj->ihw', w2c[:3, :3].T, n_cam)
            mask = np.linalg.norm(n_world, axis=0) > 0.5
            priors[c.uid] = (n_world.astype(np.float32), mask)
            c.load_normal = (
                lambda u=c.uid: priors[u])    # instance-level override

        def train(normal_optim):
            rng = np.random.default_rng(7)
            init = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
            splats = create_from_points(init, colors, capacity=64)
            cfg = OptimizationConfig(
                iterations=30, densify_from_iter=10_000,
                normal_optim=normal_optim, optim_pose=False,
                max_geo_iter=1000,
                single_view_weight_from_iter=0,
                single_view_weight_end_iter=1000,
                multi_view_weight_from_iter=10_000,
                lang_loss_start_iter=10_000,
                loss_obj_3d=False, grouping_loss=False)
            tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=3.0,
                                      sh_degree_max=0, rcfg=RCFG)
            tr.train(iterations=30)
            err = 0.0
            for c in cams:
                out = render_view(tr.state.splats, None, jnp.asarray(c.w2c),
                                  c.raster_camera(), bg, 0, False, True,
                                  None, RCFG)
                w2c = np.asarray(c.w2c)
                rn_world = np.einsum('ij,jhw->ihw', w2c[:3, :3].T,
                                     np.asarray(out.all_map[:3]))
                n_world, m = priors[c.uid]
                cos = np.sum(rn_world * n_world, 0) / np.maximum(
                    np.linalg.norm(rn_world, axis=0)
                    * np.linalg.norm(n_world, axis=0), 1e-8)
                err += float(np.mean((1 - cos)[m])) / len(cams)
            return err

        e_with = train(True)
        e_without = train(False)
        assert e_with < e_without, (e_with, e_without)
