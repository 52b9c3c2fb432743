import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.train.per_point_adam import (per_point_adam,
                                                 confidence_lr)
from langscenex_tpu.utils.pose_eval import (umeyama, align_trajectory,
                                            ate_rmse, rpe)
from langscenex_tpu.utils.camera_paths import (ellipse_path, spiral_path,
                                               interpolate_path,
                                               gen_virtual_cam,
                                               post_pose_process)


class TestPerPointAdam:
    def test_descends(self):
        tx = per_point_adam(lr=0.1)
        params = {"x": jnp.ones((10, 3))}
        state = tx.init(params)
        for _ in range(50):
            grads = {"x": params["x"] * 2.0}   # grad of sum(x^2)
            upd, state = tx.update(grads, state, params)
            params = {"x": params["x"] + upd["x"]}
        assert float(jnp.abs(params["x"]).max()) < 0.5

    def test_per_point_scaling(self):
        pplr = jnp.concatenate([jnp.full((5, 1), 1.0),
                                jnp.full((5, 1), 0.01)])
        tx = per_point_adam(lr=0.1, init_per_point_lr=pplr, adjust=False)
        params = {"x": jnp.ones((10, 3))}
        state = tx.init(params)
        grads = {"x": jnp.ones((10, 3))}
        upd, _ = tx.update(grads, state, params)
        # rows with small per-point lr move ~100x less
        ratio = float(jnp.abs(upd["x"][0]).mean()
                      / jnp.abs(upd["x"][7]).mean())
        assert ratio > 50

    def test_confidence_lr_range(self):
        # exact load_and_prepare_confidence (gaussian_field.py:85-107):
        # lr = (1 - sigmoid(c)) * (hi - lo) + lo
        c = jnp.asarray(np.linspace(-5, 5, 10))
        lr = confidence_lr(c, scale=(2, 100))
        expect = (1 - 1 / (1 + np.exp(-np.linspace(-5, 5, 10)))) * 98 + 2
        np.testing.assert_allclose(np.asarray(lr)[:, 0], expect, rtol=1e-5)
        # high confidence -> low lr, bounded by the scale range
        assert float(lr[-1, 0]) < float(lr[0, 0])
        assert float(lr.min()) >= 2 and float(lr.max()) <= 100


class TestPoseEval:
    def test_umeyama_recovers_transform(self):
        rng = np.random.default_rng(0)
        src = rng.normal(size=(50, 3))
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        from langscenex_tpu.ops.quat import quat_to_rotmat
        R_true = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
        dst = s_true * src @ R_true.T + t_true
        s, R, t = umeyama(src, dst)
        assert s == pytest.approx(s_true, rel=1e-5)
        np.testing.assert_allclose(R, R_true, atol=1e-6)
        np.testing.assert_allclose(t, t_true, atol=1e-6)

    def test_ate_zero_after_alignment(self):
        rng = np.random.default_rng(1)
        gt = rng.normal(size=(30, 3))
        est = 3.0 * gt @ np.eye(3) + 5.0
        assert ate_rmse(est, gt) < 1e-6

    def test_rpe_identity(self):
        poses = np.tile(np.eye(4), (5, 1, 1))
        for i in range(5):
            poses[i, :3, 3] = [i, 0, 0]
        t_err, r_err = rpe(poses, poses)
        assert t_err < 1e-9 and r_err < 1e-6


class TestCameraPaths:
    def _centers(self):
        th = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        return np.stack([2 * np.cos(th), np.sin(th), np.zeros(8)], -1)

    def test_ellipse(self):
        poses = ellipse_path(self._centers(), n_frames=16)
        assert poses.shape == (16, 4, 4)
        # rotations orthonormal
        R = poses[:, :3, :3]
        eye = np.tile(np.eye(3), (16, 1, 1))
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-6)

    def test_spiral(self):
        poses = spiral_path(self._centers(), n_frames=10)
        assert poses.shape == (10, 4, 4)

    def test_interpolate_endpoints(self):
        a = np.eye(4)
        b = np.eye(4)
        b[:3, 3] = [1, 0, 0]
        path = interpolate_path(a, b, 5)
        np.testing.assert_allclose(path[0], a, atol=1e-6)
        np.testing.assert_allclose(path[-1], b, atol=1e-6)

    def test_virtual_cam_orthonormal(self):
        w2c = np.eye(4)
        out = gen_virtual_cam(w2c, rng=np.random.default_rng(2))
        R = out[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)

    def test_post_pose_process(self, tmp_path):
        np.savez(tmp_path / "ex.npz", pose=np.eye(4),
                 intrinsics=np.diag([100.0, 100.0, 1.0]))
        qt = np.array([[1.0, 0, 0, 0, 1.0, 2.0, 3.0]])
        post_pose_process(qt, str(tmp_path / "ex.npz"),
                          str(tmp_path / "render_camera"))
        d = np.load(tmp_path / "render_camera" / "0001.npz")
        # c2w translation = -R^T t = -t for identity rotation
        np.testing.assert_allclose(d["pose"][:3, 3], [-1, -2, -3], atol=1e-6)
