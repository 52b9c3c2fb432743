"""Tests for the complete utils/sfm.py surface + COLMAP binary writers
+ the dense-init (MASt3R/CUT3R-contract) estimator.

Reference contracts: utils/sfm_utils.py:55-512,
field_construction/pose_estimator/__init__.py:99-225.
"""
import os

import numpy as np
import pytest

from langscenex_tpu.scene import colmap_io
from langscenex_tpu.utils import sfm


class TestColmapWriters:
    def _cams(self):
        return {1: colmap_io.ColmapCamera(1, "PINHOLE", 640, 480,
                                          np.array([500., 510., 320., 240.])),
                2: colmap_io.ColmapCamera(2, "SIMPLE_PINHOLE", 64, 48,
                                          np.array([50., 32., 24.]))}

    def _imgs(self):
        q = np.array([0.9, 0.1, -0.2, 0.3])
        q = q / np.linalg.norm(q)
        return {1: colmap_io.ColmapImage(1, q, np.array([1., 2., 3.]), 1,
                                         "a.png"),
                7: colmap_io.ColmapImage(7, np.array([1., 0., 0., 0.]),
                                         np.array([-1., 0., 4.]), 2,
                                         "b.png")}

    def test_cameras_binary_roundtrip(self, tmp_path):
        p = str(tmp_path / "cameras.bin")
        colmap_io.write_cameras_binary(self._cams(), p)
        back = colmap_io.read_cameras_binary(p)
        for cid, cam in self._cams().items():
            assert back[cid].model == cam.model
            assert back[cid].width == cam.width
            np.testing.assert_allclose(back[cid].params, cam.params)

    def test_images_binary_roundtrip(self, tmp_path):
        p = str(tmp_path / "images.bin")
        colmap_io.write_images_binary(self._imgs(), p)
        back = colmap_io._read_images_binary_py(p)
        for iid, im in self._imgs().items():
            np.testing.assert_allclose(back[iid].qvec, im.qvec)
            np.testing.assert_allclose(back[iid].tvec, im.tvec)
            assert back[iid].name == im.name
            assert back[iid].camera_id == im.camera_id

    def test_images_text_roundtrip(self, tmp_path):
        # regression: the writer emits EMPTY 2D-point lines; the reader
        # must not treat the blank line as the next image header
        p = str(tmp_path / "images.txt")
        colmap_io.write_images_text(self._imgs(), p)
        back = colmap_io.read_images_text(p)
        assert set(back) == {1, 7}
        np.testing.assert_allclose(back[7].tvec, [-1., 0., 4.])

    def test_points3d_binary_roundtrip(self, tmp_path):
        p = str(tmp_path / "points3D.bin")
        xyz = np.array([[0., 1., 2.], [3., 4., 5.]])
        rgb = np.array([[255, 0, 10], [1, 2, 3]])
        colmap_io.write_points3d_binary(p, xyz, rgb, np.array([0.5, 0.25]))
        x2, c2, e2 = colmap_io._read_points3d_binary_py(p)
        np.testing.assert_allclose(x2, xyz)
        np.testing.assert_allclose(c2, rgb)
        np.testing.assert_allclose(e2.reshape(-1), [0.5, 0.25])

    def test_points3d_text_roundtrip(self, tmp_path):
        p = str(tmp_path / "points3D.txt")
        xyz = np.array([[0., 1., 2.]])
        rgb = np.array([[9, 8, 7]])
        colmap_io.write_points3d_text(p, xyz, rgb)
        x2, c2, _ = colmap_io.read_points3d_text(p)
        np.testing.assert_allclose(x2, xyz)
        np.testing.assert_allclose(c2, rgb)


class TestSfmFiles:
    def test_sorted_image_files_numeric(self, tmp_path):
        for name in ["frame_10.png", "frame_2.png", "frame_1.png",
                     "notes.txt"]:
            (tmp_path / name).write_bytes(b"x")
        files, suffix = sfm.get_sorted_image_files(str(tmp_path))
        assert [os.path.basename(f) for f in files] == [
            "frame_1.png", "frame_2.png", "frame_10.png"]
        assert suffix == ".png"

    def test_split_train_test_disjoint(self):
        files = [f"{i}.png" for i in range(40)]
        train, test = sfm.split_train_test(files, n_views=8)
        assert len(test) == 12 and len(train) == 8
        assert not set(train) & set(test)
        # test views are interior
        assert "0.png" not in test and "39.png" not in test

    def test_load_images_sizing(self, tmp_path):
        from PIL import Image
        Image.new("RGB", (800, 600)).save(tmp_path / "0.png")
        views, org = sfm.load_images(str(tmp_path), size=512)
        assert org == (800, 600)
        h, w = views[0]["true_shape"][0]
        assert max(h, w) <= 512 and h % 16 == 0 and w % 16 == 0
        assert views[0]["img"].min() >= -1.0 and views[0]["img"].max() <= 1.0


class TestAlignment:
    def test_align_pose_rotation_recovered(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(20, 3))
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        b = (a @ R.T) * 3.0 + np.array([5.0, -1.0, 2.0])
        m1, m2_aligned, R = sfm.align_pose(a, b)
        # R maps m1 onto m2 (scipy convention: min ||m1 R - m2||); the
        # scale factor folded into m2_aligned is 1 for unit-Frobenius
        # inputs related by a pure rotation
        np.testing.assert_allclose(m1 @ R, m2_aligned, atol=1e-10)

    def test_redundancy_masks_identical_views(self):
        # two identical views: the lower-confidence one is fully
        # redundant, the higher-confidence one untouched
        H, W = 12, 16
        K = np.array([[20., 0, W / 2], [0, 20., H / 2], [0, 0, 1]])
        depth = np.full((H, W), 2.0)
        ys, xs = np.mgrid[0:H, 0:W]
        pts = np.stack([(xs - K[0, 2]) / K[0, 0] * depth,
                        (ys - K[1, 2]) / K[1, 1] * depth, depth], -1)
        masks = sfm.compute_redundancy_masks(
            np.array([0, 1]), np.stack([depth, depth]),
            np.stack([pts, pts]), np.stack([K, K]),
            np.stack([np.eye(4), np.eye(4)]), (2, H, W))
        assert not masks[0].any()
        assert masks[1].mean() > 0.9


class TestSavePoints3D:
    def test_mask_and_downsample(self, tmp_path):
        rng = np.random.default_rng(0)
        n, h, w = 2, 8, 8
        imgs = rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32)
        pts = rng.normal(size=(n, h, w, 3)).astype(np.float32)
        confs = rng.uniform(1, 5, (n, h * w)).astype(np.float32)
        masks = np.zeros((n, h, w), bool)
        masks[:, :4] = True          # keep half
        sparse = tmp_path / "sparse" / "0"
        sparse.mkdir(parents=True)
        kept = sfm.save_points3D(sparse, imgs, pts, confs, masks,
                                 use_masks=True, save_txt_path=tmp_path,
                                 max_pts_num=30)
        assert kept == 30            # 64 masked -> downsampled to 30
        assert (sparse / "points3D.ply").exists()
        assert (sparse / "confidence.npy").exists()
        assert np.load(sparse / "confidence_dsp.npy").shape[0] == 30
        log = (tmp_path / "pts_num.txt").read_text()
        assert "Vanilla points num: 128" in log
        assert "Co_Mask DSP points num: 64" in log

    def test_save_extrinsic_intrinsics_tree(self, tmp_path):
        w2cs = np.tile(np.eye(4), (3, 1, 1))
        w2cs[:, 0, 3] = [0.0, 1.0, 2.0]
        files = [f"img_{i}.png" for i in range(3)]
        sfm.save_extrinsic(tmp_path, w2cs, files, ".png")
        sfm.save_intrinsics(tmp_path, np.array([100.0] * 3), (640, 480),
                            (3, 48, 64), save_focals=True)
        imgs = colmap_io.read_images_binary(str(tmp_path / "images.bin"))
        assert [im.name for im in imgs.values()] == files
        np.testing.assert_allclose(
            [im.tvec[0] for im in imgs.values()], [0.0, 1.0, 2.0])
        cams = colmap_io.read_cameras_binary(str(tmp_path / "cameras.bin"))
        assert cams[1].model == "PINHOLE"
        # focal scaled from 64->640 processing->original width
        assert cams[1].params[0] == pytest.approx(1000.0)
        assert (tmp_path / "non_scaled_focals.npy").exists()


class TestDenseInitEstimator:
    def test_end_to_end_tiny_vggt(self, tmp_path):
        import jax
        from PIL import Image

        from langscenex_tpu.models.vggt import VGGT, VGGTConfig
        from langscenex_tpu.pose_estimation import (estimate_poses_dense_init,
                                                    get_pose_estimator)
        assert get_pose_estimator("mast3r") is estimate_poses_dense_init
        assert get_pose_estimator("cut3r") is estimate_poses_dense_init

        cfg = VGGTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                         num_heads=2, num_register_tokens=2,
                         vit_embed_dim=32, vit_depth=2, vit_num_heads=2,
                         camera_trunk_depth=1, camera_iterations=2,
                         intermediate_layers=(0, 0, 1, 1),
                         dpt_features=16, dpt_out_channels=(16, 16, 16, 16))
        rng = np.random.default_rng(0)
        inp = tmp_path / "input"
        inp.mkdir()
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (28, 28, 3),
                                         dtype=np.uint8)).save(
                inp / f"{i:04d}.png")
        model = VGGT(cfg)
        import jax.numpy as jnp
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, 3, 28, 28)))
        estimate_poses_dense_init(str(tmp_path), params=params, cfg=cfg,
                                  max_pts_num=500)
        sparse = tmp_path / "sparse_0" / "0"
        for f in ["images.bin", "images.txt", "cameras.bin", "cameras.txt",
                  "points3D.ply", "confidence.npy", "confidence_dsp.npy"]:
            assert (sparse / f).exists(), f
        assert (tmp_path / "pts_num.txt").exists()
        imgs = colmap_io.read_images_binary(str(sparse / "images.bin"))
        assert len(imgs) == 3
        assert np.load(sparse / "confidence_dsp.npy").shape[0] <= 500
