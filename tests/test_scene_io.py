import os

import numpy as np
import pytest

from langscenex_tpu.scene import colmap_io
from langscenex_tpu.scene.dataset_readers import (
    read_cut3r_scene, read_ply_points, write_ply_points, load_scene,
    nerfpp_norm)


def make_npz_scene(tmp_path, n=4, W=64, H=48):
    cam_dir = tmp_path / "camera"
    cam_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        ang = i * 0.1
        Rz = np.array([[np.cos(ang), 0, np.sin(ang)],
                       [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]])
        pose = np.eye(4)
        pose[:3, :3] = Rz
        pose[:3, 3] = [i * 0.1, 0, -3]
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
        np.savez(cam_dir / f"{i:04d}.npz", pose=pose, intrinsics=K)
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    write_ply_points(str(tmp_path / "points3D.ply"), pts, cols)
    return pts, cols


class TestNpzScene:
    def test_roundtrip(self, tmp_path):
        pts, cols = make_npz_scene(tmp_path)
        info = read_cut3r_scene(str(tmp_path))
        assert len(info.cameras) == 4
        cam = info.cameras[0]
        assert (cam.width, cam.height) == (64, 48)
        np.testing.assert_allclose(info.points, pts, atol=1e-6)
        np.testing.assert_allclose(info.colors, cols, atol=2e-2)
        # camera 0: identity rotation, center at (0,0,-3)
        np.testing.assert_allclose(cam.cam_center, [0, 0, -3], atol=1e-5)

    def test_load_scene_nearest(self, tmp_path):
        make_npz_scene(tmp_path)
        info = load_scene(str(tmp_path), kind="cut3r", max_dis=10.0,
                          shuffle=False)
        assert any(c.nearest_id for c in info.cameras)
        assert info.nerf_norm_radius > 0


class TestColmapText:
    def test_text_roundtrip(self, tmp_path):
        cams = {1: colmap_io.ColmapCamera(1, "PINHOLE", 64, 48,
                                          np.array([80.0, 80.0, 32.0, 24.0]))}
        q = np.array([0.9238795, 0.0, 0.3826834, 0.0])
        imgs = {1: colmap_io.ColmapImage(1, q, np.array([0.1, 0.2, 0.3]),
                                         1, "0001.png")}
        colmap_io.write_cameras_text(cams, str(tmp_path / "cameras.txt"))
        colmap_io.write_images_text(imgs, str(tmp_path / "images.txt"))
        cams2 = colmap_io.read_cameras_text(str(tmp_path / "cameras.txt"))
        imgs2 = colmap_io.read_images_text(str(tmp_path / "images.txt"))
        assert cams2[1].model == "PINHOLE"
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        np.testing.assert_allclose(imgs2[1].qvec, q)
        np.testing.assert_allclose(imgs2[1].tvec, [0.1, 0.2, 0.3])

    def test_qvec_rotmat(self):
        q = np.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(colmap_io.qvec_to_rotmat(q), np.eye(3))


class TestPly:
    def test_ascii_and_binary(self, tmp_path):
        pts = np.array([[0, 0, 0], [1, 2, 3]], np.float32)
        write_ply_points(str(tmp_path / "b.ply"), pts)
        p2, c2 = read_ply_points(str(tmp_path / "b.ply"))
        np.testing.assert_allclose(p2, pts)
        # ascii variant
        with open(tmp_path / "a.ply", "w") as f:
            f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n0 0 0\n1 2 3\n")
        p3, _ = read_ply_points(str(tmp_path / "a.ply"))
        np.testing.assert_allclose(p3, pts)


class TestBlenderScene:
    def test_transforms_reader(self, tmp_path):
        import json
        frames = []
        for i in range(3):
            c2w = np.eye(4)
            c2w[0, 3] = i * 0.2
            c2w[2, 3] = 4.0
            frames.append({"file_path": f"./train/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(tmp_path / "transforms_train.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
        from langscenex_tpu.scene.dataset_readers import (read_blender_scene,
                                                          load_scene)
        info = read_blender_scene(str(tmp_path))
        assert len(info.cameras) == 3
        assert info.points.shape[0] == 100_000
        # blender y/z flip: camera center preserved
        np.testing.assert_allclose(info.cameras[1].cam_center,
                                   [0.2, 0, 4.0], atol=1e-6)
        info2 = load_scene(str(tmp_path), shuffle=False)
        assert len(info2.cameras) == 3


class TestColmapBinary:
    """Binary parsers: C++ native path vs pure-Python fallback."""

    @staticmethod
    def _write_binary_scene(tmp_path, n_pts=50, n_imgs=3):
        import struct
        rng = np.random.default_rng(7)
        xyz = rng.normal(size=(n_pts, 3))
        rgb = rng.integers(0, 256, (n_pts, 3)).astype(np.uint8)
        err = rng.random(n_pts)
        with open(tmp_path / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", n_pts))
            for i in range(n_pts):
                f.write(struct.pack("<Q", i + 1))
                f.write(struct.pack("<3d", *xyz[i]))
                f.write(struct.pack("<3B", *rgb[i]))
                f.write(struct.pack("<d", err[i]))
                tl = int(rng.integers(0, 5))
                f.write(struct.pack("<Q", tl))
                f.write(b"\x00" * (8 * tl))
        qv = rng.normal(size=(n_imgs, 4))
        qv /= np.linalg.norm(qv, axis=1, keepdims=True)
        tv = rng.normal(size=(n_imgs, 3))
        with open(tmp_path / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", n_imgs))
            for i in range(n_imgs):
                f.write(struct.pack("<i", i + 1))
                f.write(struct.pack("<4d", *qv[i]))
                f.write(struct.pack("<3d", *tv[i]))
                f.write(struct.pack("<i", 1))
                f.write(f"frame_{i:03d}.png".encode() + b"\x00")
                npts = int(rng.integers(0, 4))
                f.write(struct.pack("<Q", npts))
                f.write(b"\x00" * (24 * npts))
        return xyz, rgb, err, qv, tv

    def test_points3d_native_matches_python(self, tmp_path):
        xyz, rgb, err, _, _ = self._write_binary_scene(tmp_path)
        p = str(tmp_path / "points3D.bin")
        x2, c2, e2 = colmap_io._read_points3d_binary_py(p)
        np.testing.assert_allclose(x2, xyz)
        from langscenex_tpu import native
        got = native.read_points3d_binary(p)
        if got is None:
            pytest.skip("no C++ toolchain")
        x1, c1, e1 = got
        np.testing.assert_allclose(x1, xyz)
        np.testing.assert_allclose(c1, rgb.astype(np.float64))
        np.testing.assert_allclose(e1.ravel(), err)
        np.testing.assert_allclose(np.asarray(c2, np.float64), c1)
        np.testing.assert_allclose(e2, e1)

    def test_images_native_matches_python(self, tmp_path):
        _, _, _, qv, tv = self._write_binary_scene(tmp_path)
        p = str(tmp_path / "images.bin")
        py = colmap_io._read_images_binary_py(p)
        nat = colmap_io.read_images_binary(p)
        assert set(py) == set(nat)
        for iid in py:
            np.testing.assert_allclose(nat[iid].qvec, py[iid].qvec)
            np.testing.assert_allclose(nat[iid].tvec, py[iid].tvec)
            assert nat[iid].camera_id == py[iid].camera_id
            assert nat[iid].name == py[iid].name

    def test_truncated_file_falls_back_or_raises(self, tmp_path):
        import struct
        # header promises 10 points but the file ends after one
        with open(tmp_path / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", 10))
            f.write(struct.pack("<Q", 1) + struct.pack("<3d", 0, 0, 0) +
                    struct.pack("<3B", 1, 2, 3) + struct.pack("<d", 0.5) +
                    struct.pack("<Q", 0))
        from langscenex_tpu import native
        assert native.read_points3d_binary(
            str(tmp_path / "points3D.bin")) is None


def test_resolve_resolution():
    from langscenex_tpu.scene.cameras import resolve_resolution
    # explicit divisor
    assert resolve_resolution(1440, 960, resolution=2) == (720, 480)
    # auto 1.6k rule
    w, h = resolve_resolution(3200, 2400, resolution=-1)
    assert w == 1600 and h == 1200
    # small images untouched
    assert resolve_resolution(720, 480, resolution=-1) == (720, 480)
    # resolution_scale stacks
    assert resolve_resolution(720, 480, resolution=-1,
                              resolution_scale=2.0) == (360, 240)
