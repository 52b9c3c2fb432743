"""End-to-end pipeline smoke tests over the filesystem contract."""
import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from langscenex_tpu.pipeline import (FieldConstructionPipeline,
                                     PipelinePaths, VideoPreprocessor,
                                     select_valid_data)
from langscenex_tpu.utils.config import (GaussianConfig, OptimizationConfig,
                                         DatasetConfig)
from langscenex_tpu.ops.rasterize import RasterConfig
from langscenex_tpu.scene.dataset_readers import write_ply_points
from langscenex_tpu.entry_point import apply_overrides, main as cli_main


def build_scene_dir(tmp_path, n=3, W=64, H=48):
    """Minimal CUT3R-contract scene: input frames + camera npz + ply."""
    rng = np.random.default_rng(0)
    (tmp_path / "input").mkdir()
    cam_dir = tmp_path / "camera"
    cam_dir.mkdir()
    pts = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    cols = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    write_ply_points(str(tmp_path / "points3D.ply"), pts, cols)
    for i in range(n):
        img = (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "input" / f"{i + 1:04d}.png")
        pose = np.eye(4)
        pose[:3, 3] = [0.05 * i, 0, 0]
        K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
        np.savez(cam_dir / f"{i + 1:04d}.npz", pose=pose, intrinsics=K)
    return tmp_path


class TestVideoPreprocessor:
    def test_frame_dir_copy(self, tmp_path):
        src = tmp_path / "frames"
        src.mkdir()
        for i in range(3):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                src / f"f{i}.png")
        paths = PipelinePaths(data_path=str(tmp_path),
                              rgb_video_path=str(src))
        VideoPreprocessor(paths).extract_frames(str(src), "input")
        assert sorted(os.listdir(tmp_path / "input")) == \
            ["0001.png", "0002.png", "0003.png"]

    def test_extract_masks(self, tmp_path):
        colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
        np.save(tmp_path / "colors.npy", colors)
        seg_dir = tmp_path / "seg"
        seg_dir.mkdir()
        img = np.zeros((8, 8, 3), np.uint8)
        img[:4] = [255, 0, 0]     # -> id 0
        img[4:] = [0, 255, 0]     # -> id 1
        Image.fromarray(img).save(seg_dir / "0001.png")
        paths = PipelinePaths(data_path=str(tmp_path),
                              seg_video_path=str(seg_dir))
        VideoPreprocessor(paths).extract_masks("lang_features_dim3")
        seg = np.load(tmp_path / "lang_features_dim3" / "0001_s.npy")
        # id = argmin - 1: color 0 -> -1? NO: palette row0 -> id -1+1...
        assert seg.shape == (8, 8)
        assert len(np.unique(seg)) == 2


class TestConstructField:
    def test_train_render_eval(self, tmp_path):
        build_scene_dir(tmp_path)
        cfg = GaussianConfig(
            opt=OptimizationConfig(
                iterations=6, max_geo_iter=100,
                single_view_weight_from_iter=10_000,
                multi_view_weight_from_iter=10_000,
                lang_loss_start_iter=10_000, densify_from_iter=10_000,
                optim_pose=False, loss_obj_3d=False, grouping_loss=False),
            dataset=DatasetConfig(sh_degree=1),
        )
        cfg.render.load_iteration = 6
        cfg.render.pose_optim_iter = 2
        pipe = FieldConstructionPipeline(
            PipelinePaths(data_path=str(tmp_path), skip_video_process=True,
                          skip_pose_estimate=True,
                          skip_lang_feature_extraction=True))
        pipe.cfg = cfg
        state, metrics = pipe.construct_field(iterations=6)
        ply = tmp_path / "output" / "point_cloud" / "iteration_6" / \
            "point_cloud.ply"
        assert ply.exists()
        assert (tmp_path / "output" / "pose" / "iter_6" /
                "pose_optimized.npy").exists()
        pipe.render_result(load_iteration=6)
        renders = os.listdir(tmp_path / "output" / "renders" / "iteration_6")
        assert any(f.endswith("_render.png") for f in renders)
        results = pipe.eval(load_iteration=6)
        assert len(results) == 3
        assert all(np.isfinite(r["psnr"]) for r in results)


class TestSelectValidData:
    def test_subsample(self, tmp_path):
        inp = tmp_path / "input"
        inp.mkdir()
        for i in range(10):
            Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
                inp / f"{i + 1:04d}.png")
        select_valid_data(str(tmp_path), chunk_num=2, keep_per_chunk=2,
                          dirs=("input",))
        kept = sorted(os.listdir(inp))
        assert len(kept) == 4
        assert (tmp_path / "input_raw").is_dir()


class TestCLI:
    def test_overrides(self):
        cfg = GaussianConfig()
        apply_overrides(cfg, {"opt.iterations": "500",
                              "dataset.white_background": "true",
                              "opt.lambda_dssim": "0.3"})
        assert cfg.opt.iterations == 500
        assert cfg.dataset.white_background is True
        assert cfg.opt.lambda_dssim == pytest.approx(0.3)

    def test_unknown_mode_errors(self):
        with pytest.raises(SystemExit):
            cli_main(["mode=bogus"])
