import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.ops.rasterize import RasterConfig, rasterize
from langscenex_tpu.ops.transforms import projection_matrix, focal2fov, fov2focal
from langscenex_tpu.scene.cameras import Camera, rgb_to_gray, compute_nearest_cameras
from langscenex_tpu.scene.gaussians import (GaussianState, DensifyStats,
                                            create_from_points)
from langscenex_tpu.train.field import (GaussianFieldTrainer, phase_flags,
                                        render_view)
from langscenex_tpu.train.densify import densify_and_prune
from langscenex_tpu.utils.config import OptimizationConfig

W, H = 48, 32
RCFG = RasterConfig(tile_w=16, tile_h=8, max_tiles_per_splat=64, chunk=32,
                    max_splats_per_tile=256)


def make_cams(n=4, radius=4.0):
    cams = []
    fovx = 0.9
    fovy = focal2fov(fov2focal(fovx, W), H)
    for i in range(n):
        ang = (i - n / 2) * 0.15
        # camera on a small arc looking at origin
        Rz = np.array([[np.cos(ang), 0, np.sin(ang)],
                       [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
        # w2c rotation: camera looks down +z at origin
        C = Rz @ np.array([0, 0, -radius])
        Rw2c = Rz.T
        T = -Rw2c @ C
        cams.append(Camera(uid=i, colmap_id=i, R=Rw2c.T, T=T, fovx=fovx,
                           fovy=fovy, width=W, height=H,
                           image_name=f"{i:04d}"))
    return cams


def gt_scene(P=60, seed=3):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (P, 3)).astype(np.float32) * [1.2, 0.8, 0.6]
    colors = rng.uniform(0.1, 0.9, (P, 3)).astype(np.float32)
    return pts, colors


def render_gt_images(cams, pts, colors):
    state = create_from_points(pts, colors, capacity=pts.shape[0])
    # make gt splats chunky and opaque
    state = dataclasses.replace(
        state,
        scaling=jnp.full_like(state.scaling, np.log(0.15)),
        opacity=jnp.full_like(state.opacity, 3.0))
    imgs = []
    for c in cams:
        out = render_view(state, None, jnp.asarray(c.w2c), c.raster_camera(),
                          jnp.zeros(3), 0, False, False, None, RCFG)
        imgs.append(np.asarray(out.color))
    return imgs


class TestTrainerSmoke:
    def test_image_loss_decreases(self):
        cams = make_cams()
        pts, colors = gt_scene()
        gt_imgs = render_gt_images(cams, pts, colors)
        for c, img in zip(cams, gt_imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        compute_nearest_cameras(cams, max_dis=10.0)

        rng = np.random.default_rng(7)
        noisy = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
        splats = create_from_points(noisy, np.full_like(colors, 0.5),
                                    capacity=128)
        cfg = OptimizationConfig(
            iterations=60, max_geo_iter=1000,
            single_view_weight_from_iter=10_000,   # keep smoke test fast
            multi_view_weight_from_iter=10_000,
            lang_loss_start_iter=10_000,
            densify_from_iter=10_000,
            optim_pose=False, loss_obj_3d=False, grouping_loss=False)
        tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                                  sh_degree_max=1, rcfg=RCFG)
        losses = []
        tr.train(iterations=40,
                 callback=lambda it, st, m: losses.append(float(m['image_loss'])))
        first = np.mean(losses[:8])
        last = np.mean(losses[-8:])
        assert last < first * 0.85, f"loss did not decrease: {first} -> {last}"

    def test_pose_optimization_path_runs(self):
        cams = make_cams(n=3)
        pts, colors = gt_scene(P=40)
        gt_imgs = render_gt_images(cams, pts, colors)
        for c, img in zip(cams, gt_imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        splats = create_from_points(pts, colors, capacity=64)
        cfg = OptimizationConfig(
            iterations=10, max_geo_iter=1000,
            single_view_weight_from_iter=2, single_view_weight_end_iter=1000,
            multi_view_weight_from_iter=10_000, lang_loss_start_iter=10_000,
            densify_from_iter=10_000, optim_pose=True,
            loss_obj_3d=False, grouping_loss=False)
        tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                                  rcfg=RCFG)
        state, metrics = tr.train(iterations=6)
        assert np.all(np.isfinite(np.asarray(state.poses)))
        assert 'normal_loss' in metrics
        # poses should have moved (being optimized)
        init_poses = np.stack([np.asarray(
            tr.cams[i].w2c) for i in range(3)])
        assert np.isfinite(float(metrics['image_loss']))

    def test_multiview_and_lang_phases_run(self):
        cams = make_cams(n=3)
        pts, colors = gt_scene(P=40)
        gt_imgs = render_gt_images(cams, pts, colors)
        rng = np.random.default_rng(0)
        for c, img in zip(cams, gt_imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        compute_nearest_cameras(cams, max_dis=100.0)
        assert any(c.nearest_id for c in cams)
        splats = create_from_points(pts, colors, capacity=64)
        cfg = OptimizationConfig(
            iterations=8, max_geo_iter=6,
            single_view_weight_from_iter=1, single_view_weight_end_iter=1000,
            multi_view_weight_from_iter=1, multi_view_weight_end_iter=1000,
            multi_view_sample_num=256,
            lang_loss_start_iter=4, densify_from_iter=10_000,
            optim_pose=False, loss_obj_3d=True, grouping_loss=True,
            instance_supervision_from_iter=8)
        # fake language features on the cameras via the batch cache
        tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                                  rcfg=RCFG)
        for ci in range(len(cams)):
            arrs = tr._camera_arrays(ci)
            arrs['lang_feat'] = jnp.asarray(
                rng.uniform(-1, 1, (3, H, W)).astype(np.float32))
            arrs['lang_mask'] = jnp.ones((H, W), bool)
            arrs['seg'] = jnp.asarray(
                rng.integers(0, 5, (H, W)).astype(np.int32))
        state, metrics = tr.train(iterations=8)
        # ran through geo+multiview, lang, and instance phases
        assert 'ins_grouping_loss' in metrics or 'ins_obj3d_loss' in metrics
        assert np.all(np.isfinite(np.asarray(state.splats.language_feature)))


class TestDensify:
    def _mini_state(self, P=20, cap=40):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
        colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
        return create_from_points(pts, colors, capacity=cap)

    def test_clone_small_splats(self):
        state = self._mini_state()
        cap = state.capacity
        stats = DensifyStats.zeros(cap)
        # large positional gradients on first 5 alive splats
        grad = jnp.zeros(cap).at[:5].set(1.0)
        stats = dataclasses.replace(stats, xyz_gradient_accum=grad,
                                    denom=jnp.ones(cap))
        # tiny scales -> clone path
        state = dataclasses.replace(state, scaling=jnp.full_like(state.scaling, -8.0))
        cfg = OptimizationConfig(densify_grad_threshold=0.5, percent_dense=0.01)
        res = densify_and_prune(jax.random.PRNGKey(0), state, stats, cfg,
                                scene_extent=10.0, size_threshold=None)
        assert int(res.n_cloned) == 5
        assert int(res.n_split) == 0
        assert int(jnp.sum(res.state.alive)) == 25

    def test_split_large_splats(self):
        state = self._mini_state()
        cap = state.capacity
        stats = DensifyStats.zeros(cap)
        grad = jnp.zeros(cap).at[:4].set(1.0)
        stats = dataclasses.replace(stats, xyz_gradient_accum=grad,
                                    denom=jnp.ones(cap))
        # huge scales -> split path
        state = dataclasses.replace(state, scaling=jnp.full_like(state.scaling, 0.0))
        cfg = OptimizationConfig(densify_grad_threshold=0.5,
                                 percent_dense=0.001,
                                 opacity_cull_threshold=0.01)
        res = densify_and_prune(jax.random.PRNGKey(0), state, stats, cfg,
                                scene_extent=1.0, size_threshold=None)
        assert int(res.n_split) == 4
        # scale reduced on split splats
        assert float(res.state.scaling[0, 0]) == pytest.approx(
            np.log(1.0 / 1.6), abs=1e-4)

    def test_prune_low_opacity(self):
        state = self._mini_state()
        cap = state.capacity
        op = state.opacity.at[:3].set(-10.0)  # sigmoid ~ 0
        state = dataclasses.replace(state, opacity=op)
        stats = DensifyStats.zeros(cap)
        cfg = OptimizationConfig(densify_grad_threshold=1e9,
                                 opacity_cull_threshold=0.05)
        res = densify_and_prune(jax.random.PRNGKey(0), state, stats, cfg,
                                scene_extent=1.0, size_threshold=None)
        assert int(res.n_pruned) == 3
        assert int(jnp.sum(res.state.alive)) == 17

    def test_capacity_respected(self):
        state = self._mini_state(P=20, cap=24)
        cap = state.capacity
        stats = DensifyStats.zeros(cap)
        grad = jnp.zeros(cap).at[:20].set(1.0)   # all want to clone
        stats = dataclasses.replace(stats, xyz_gradient_accum=grad,
                                    denom=jnp.ones(cap))
        state = dataclasses.replace(state, scaling=jnp.full_like(state.scaling, -8.0))
        cfg = OptimizationConfig(densify_grad_threshold=0.5, percent_dense=0.01)
        res = densify_and_prune(jax.random.PRNGKey(0), state, stats, cfg,
                                scene_extent=10.0, size_threshold=None)
        assert int(jnp.sum(res.state.alive)) <= cap


class TestObservability:
    def test_training_report_and_collage(self, tmp_path):
        """test_iterations PSNR validation + 8-panel debug collage
        (gaussian_field.py:562-602, 342-378)."""
        from langscenex_tpu.train.field import GaussianFieldTrainer
        cams = make_cams(n=3)
        pts, colors = gt_scene(P=40)
        imgs = render_gt_images(cams, pts, colors)
        for c, img in zip(cams, imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        splats = create_from_points(pts, colors, capacity=64)
        cfg = OptimizationConfig(iterations=4, densify_from_iter=999,
                                 multi_view_sample_num=16)
        tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=3.0,
                                  sh_degree_max=0, rcfg=RCFG)
        tr.train(iterations=4, save_dir=str(tmp_path),
                 test_iterations=(2,), collage_interval=3)
        valid = os.listdir(tmp_path / "valid")
        assert any(f.startswith("2_") and f.endswith(".png")
                   for f in valid)
        debug = os.listdir(tmp_path / "debug")
        assert any(f.startswith("00003_") for f in debug)
        rep = tr.training_report(5, str(tmp_path))
        assert np.isfinite(rep["psnr"]) and rep["psnr"] > 0


class TestResume:
    def test_checkpoint_resume_continues(self, tmp_path):
        """start_checkpoint resume (gaussian_field.py:146-149): restore
        the full TrainState and continue from the saved iteration."""
        from langscenex_tpu.train.checkpoint import (restore_checkpoint,
                                                     save_checkpoint)
        from langscenex_tpu.train.field import GaussianFieldTrainer
        cams = make_cams(n=2)
        pts, colors = gt_scene(P=30)
        imgs = render_gt_images(cams, pts, colors)
        for c, img in zip(cams, imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        splats = create_from_points(pts, colors, capacity=32)
        cfg = OptimizationConfig(iterations=6, densify_from_iter=999,
                                 loss_obj_3d=False, grouping_loss=False,
                                 multi_view_weight_from_iter=999,
                                 lang_loss_start_iter=999)
        tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=3.0,
                                  sh_degree_max=0, rcfg=RCFG)
        tr.train(iterations=3, save_dir=str(tmp_path),
                 checkpoint_iterations=(3,))
        xyz_at_3 = np.asarray(tr.state.splats.xyz).copy()

        tr2 = GaussianFieldTrainer(cams, splats, cfg, scene_extent=3.0,
                                   sh_degree_max=0, rcfg=RCFG)
        tr2.state, it = restore_checkpoint(str(tmp_path), tr2.state)
        assert it == 3
        np.testing.assert_allclose(np.asarray(tr2.state.splats.xyz),
                                   xyz_at_3)
        tr2.train(iterations=6, first_iteration=it + 1)
        assert int(tr2.state.step) >= 3
        assert not np.allclose(np.asarray(tr2.state.splats.xyz), xyz_at_3)


class TestPerPointOptimizer:
    def test_pp_optimizer_trains_and_densifies(self):
        """cfg.pp_optimizer=True runs PerPointAdam on xyz
        (training_setup_pp, gaussian_model.py:344-382) incl. a densify
        state reset that keeps new slots' per-point lr at the neutral 1."""
        from langscenex_tpu.train.field import GaussianFieldTrainer
        from langscenex_tpu.train.optim import zero_moments_at
        from langscenex_tpu.train.per_point_adam import PerPointAdamState

        cams = make_cams(n=2)
        pts, colors = gt_scene(P=30)
        imgs = render_gt_images(cams, pts, colors)
        for c, img in zip(cams, imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        splats = create_from_points(pts, colors, capacity=64)
        conf = np.linspace(0.5, 2.0, 64, dtype=np.float32)[:, None]
        cfg = OptimizationConfig(pp_optimizer=True, iterations=4,
                                 densify_from_iter=1, densify_until_iter=3,
                                 densification_interval=2,
                                 densify_grad_threshold=1e-9,
                                 loss_obj_3d=False, grouping_loss=False,
                                 multi_view_weight_from_iter=999,
                                 lang_loss_start_iter=999)
        tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=3.0,
                                  sh_degree_max=0, rcfg=RCFG,
                                  confidence_lr=jnp.asarray(conf))
        state, metrics = tr.train(iterations=4)
        assert np.isfinite(float(metrics['total']))

        def find_pp(node):
            if isinstance(node, PerPointAdamState):
                return node
            if isinstance(node, (tuple, list)):
                for c in node:
                    r = find_pp(c)
                    if r is not None:
                        return r
            if isinstance(node, dict):
                for c in node.values():
                    r = find_pp(c)
                    if r is not None:
                        return r
            return None

        pp = find_pp(tr.state.splat_opt)
        assert pp is not None
        pplr = np.asarray(pp.per_point_lr)
        assert pplr.shape == (64, 1) and np.all(np.isfinite(pplr))
        # slots written by densify reset to neutral lr 1, not 0
        mask = jnp.zeros(64, bool).at[60].set(True)
        reset = find_pp(zero_moments_at(tr.state.splat_opt, mask))
        np.testing.assert_allclose(np.asarray(reset.per_point_lr)[60], 1.0)
        assert np.all(np.asarray(reset.mu['xyz'] if isinstance(reset.mu, dict)
                                 else reset.mu)[60] == 0)


class TestAdaptivePairCaps:
    """_grow_pair_caps: overflow-driven growth of the static binning caps
    (max_pairs / K) with step-cache invalidation."""

    def _trainer(self, rcfg):
        cams = make_cams(n=3)
        pts, colors = gt_scene(P=40)
        gt_imgs = render_gt_images(cams, pts, colors)
        for c, img in zip(cams, gt_imgs):
            c.image = np.clip(img, 0, 1)
            c.image_gray = rgb_to_gray(c.image)
        splats = create_from_points(pts, colors, capacity=64)
        cfg = OptimizationConfig(
            iterations=110, max_geo_iter=1000,
            single_view_weight_from_iter=10_000,
            multi_view_weight_from_iter=10_000, lang_loss_start_iter=10_000,
            densify_from_iter=10_000, optim_pose=False,
            loss_obj_3d=False, grouping_loss=False)
        return GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                                    rcfg=rcfg)

    def test_max_pairs_growth_unit(self):
        tr = self._trainer(dataclasses.replace(RCFG, max_pairs=128))
        tr._steps['sentinel'] = object()
        tr._grow_pair_caps({'pair_overflow': 1.0, 'num_pairs': 1000.0})
        # jumps to 1.25x demand, clamped to the P * n_tiles natural
        # ceiling (capacity 64, 3x4 tile grid)
        assert tr.rcfg.max_pairs == min(1250, 64 * 12)
        assert not tr._steps  # cache dropped -> recompile at new shapes

    def test_no_k_truncation(self):
        # A splat touching more tiles than max_tiles_per_splat must render
        # EXACTLY (K no longer bounds any single splat, only the buffer):
        # one huge splat covering the whole 48x32 image, K=1.
        pts = np.array([[0.0, 0.0, 0.0]], np.float32)
        cams = make_cams(n=1)
        from langscenex_tpu.ops.rasterize import rasterize
        cam = cams[0].raster_camera()
        big = jnp.asarray([[2.0, 2.0, 2.0]])
        q = jnp.asarray([[1.0, 0, 0, 0]])
        op = jnp.asarray([[0.9]])
        col = jnp.asarray([[0.3, 0.6, 0.9]])
        outs = []
        for k in (1, 12):
            cfg = dataclasses.replace(RCFG, max_tiles_per_splat=k,
                                      max_pairs=64)
            outs.append(rasterize(jnp.asarray(pts), big, q, op,
                                  cam, jnp.zeros(3), colors_precomp=col,
                                  cfg=cfg))
        np.testing.assert_array_equal(np.asarray(outs[0].color),
                                      np.asarray(outs[1].color))
        assert not bool(outs[0].pairs_overflowed)

    def test_ceiling_no_growth(self):
        tr = self._trainer(RCFG)  # default: max_pairs = 64k floor > P*K
        mp0, steps = tr.rcfg.max_pairs, dict(tr._steps)
        tr._grow_pair_caps({'pair_overflow': 1.0, 'num_pairs': 99999.0})
        # natural P * n_tiles ceiling already covered by the floor: no change
        assert tr.rcfg.max_pairs == mp0

    def test_growth_in_training_loop(self):
        # max_pairs far below the real pair count: the it=100 check must
        # grow the cap and training must continue at the new shapes
        tr = self._trainer(dataclasses.replace(RCFG, max_pairs=64))
        state, metrics = tr.train(iterations=105)
        assert tr.rcfg.max_pairs > 64
        assert np.isfinite(float(metrics['image_loss']))
