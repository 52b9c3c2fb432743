import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.ops import sh as sh_ops
from langscenex_tpu.ops import quat as quat_ops
from langscenex_tpu.ops import transforms as tf
from langscenex_tpu.ops.covariance import (compute_cov3d, compute_cov2d,
                                           conic_and_radius)


class TestQuat:
    def test_identity(self):
        q = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(quat_ops.quat_to_rotmat(q), np.eye(3), atol=1e-6)

    def test_90deg_z(self):
        # 90° about z: (w,x,y,z) = (cos45, 0, 0, sin45)
        s = np.sin(np.pi / 4)
        q = jnp.array([s, 0, 0, s])
        R = quat_ops.quat_to_rotmat(q)
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(64, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q[q[:, 0] < 0] *= -1
        R = quat_ops.quat_to_rotmat(jnp.asarray(q))
        q2 = quat_ops.rotmat_to_quat(R)
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_rotmat_orthonormal(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(16, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        R = np.asarray(quat_ops.quat_to_rotmat(jnp.asarray(q)))
        eye = np.broadcast_to(np.eye(3), (16, 3, 3))
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)

    def test_multiply_matches_matrix_product(self):
        rng = np.random.default_rng(2)
        q1 = rng.normal(size=(8, 4)).astype(np.float32)
        q2 = rng.normal(size=(8, 4)).astype(np.float32)
        q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
        q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
        q12 = quat_ops.quat_multiply(jnp.asarray(q1), jnp.asarray(q2))
        R12 = quat_ops.quat_to_rotmat(q12)
        R1R2 = quat_ops.quat_to_rotmat(jnp.asarray(q1)) @ quat_ops.quat_to_rotmat(jnp.asarray(q2))
        np.testing.assert_allclose(R12, R1R2, atol=1e-5)

    def test_camera_tensor_roundtrip(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=(5, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q[q[:, 0] < 0] *= -1
        t = rng.normal(size=(5, 3)).astype(np.float32)
        qt = jnp.concatenate([jnp.asarray(q), jnp.asarray(t)], -1)
        M = quat_ops.camera_from_tensor(qt)
        qt2 = quat_ops.tensor_from_camera(M)
        np.testing.assert_allclose(qt2, qt, atol=1e-4)


class TestSH:
    def test_deg0_constant(self):
        sh = jnp.ones((4, 3, 1))
        dirs = jnp.array([[0, 0, 1.0]] * 4)
        out = sh_ops.eval_sh(0, sh, dirs)
        np.testing.assert_allclose(out, sh_ops.C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.25, 0.5, 0.75]])
        np.testing.assert_allclose(
            sh_ops.sh_from_rgb_dc(sh_ops.rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_parseval_deg1(self):
        # Independent check: integral of |Y_1m|^2 over sphere == 1 for the
        # real SH basis with these constants (MC estimate).
        rng = np.random.default_rng(0)
        v = rng.normal(size=(200000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        y = sh_ops.C1 * v[:, 1]  # Y_{1,-1} up to sign
        integral = 4 * np.pi * np.mean(y ** 2)
        assert abs(integral - 1.0) < 0.02

    def test_degree_nesting(self):
        rng = np.random.default_rng(4)
        sh = jnp.asarray(rng.normal(size=(10, 3, 16)).astype(np.float32))
        dirs = rng.normal(size=(10, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = jnp.asarray(dirs)
        # zeroing higher coeffs makes deg-3 eval equal lower-degree eval
        sh_low = sh.at[..., 1:].set(0.0)
        np.testing.assert_allclose(sh_ops.eval_sh(3, sh_low, dirs),
                                   sh_ops.eval_sh(0, sh_low, dirs), atol=1e-5)


class TestTransforms:
    def test_projection_corners(self):
        znear, zfar = 0.01, 100.0
        fovx, fovy = 1.0, 0.8
        P = tf.projection_matrix(znear, zfar, fovx, fovy)
        # A point on the frustum corner at z=znear maps to ndc (+-1, +-1)
        x = np.tan(fovx / 2) * znear
        y = np.tan(fovy / 2) * znear
        pt = np.array([x, y, znear])
        ndc = np.asarray(tf.transform_points(jnp.asarray(P), jnp.asarray(pt)))
        np.testing.assert_allclose(ndc[:2], [1.0, 1.0], atol=1e-4)
        # depth mapping: z=znear -> 0, z=zfar -> ~1
        near_ndc = tf.transform_points(jnp.asarray(P), jnp.array([0, 0, znear]))
        far_ndc = tf.transform_points(jnp.asarray(P), jnp.array([0, 0, zfar]))
        assert abs(float(near_ndc[2])) < 1e-4
        assert abs(float(far_ndc[2]) - 1.0) < 1e-3

    def test_world_to_view_roundtrip(self):
        rng = np.random.default_rng(5)
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        R = np.asarray(quat_ops.quat_to_rotmat(jnp.asarray(q)))
        t = rng.normal(size=3)
        # world_to_view takes R as cam-to-world rotation (COLMAP reader style)
        W = tf.world_to_view(R.T, t)
        cam_center = -W[:3, :3].T @ W[:3, 3]
        pt = tf.transform_points_3x4(jnp.asarray(W), jnp.asarray(cam_center))
        np.testing.assert_allclose(pt, np.zeros(3), atol=1e-5)

    def test_fov_focal(self):
        assert abs(tf.focal2fov(tf.fov2focal(0.9, 640), 640) - 0.9) < 1e-9

    def test_ndc_to_pix(self):
        # ndc2Pix(0, S) == (S-1)/2 (image center)
        assert float(tf.ndc_to_pix(jnp.array(0.0), 720)) == pytest.approx(359.5)
        assert float(tf.ndc_to_pix(jnp.array(-1.0), 720)) == pytest.approx(-0.5)


class TestCovariance:
    def test_cov3d_isotropic(self):
        s = jnp.full((1, 3), 0.5)
        q = jnp.array([[1.0, 0, 0, 0]])
        c = compute_cov3d(s, q)
        np.testing.assert_allclose(c[0], [0.25, 0, 0, 0.25, 0, 0.25], atol=1e-6)

    def test_cov3d_rotation_invariance_trace(self):
        rng = np.random.default_rng(6)
        s = jnp.asarray(np.abs(rng.normal(size=(20, 3))).astype(np.float32))
        q = rng.normal(size=(20, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        c = np.asarray(compute_cov3d(s, jnp.asarray(q)))
        trace = c[:, 0] + c[:, 3] + c[:, 5]
        np.testing.assert_allclose(trace, np.sum(np.asarray(s) ** 2, -1), rtol=1e-4)

    def test_cov2d_center_pinhole(self):
        # Isotropic splat on the optical axis at depth z: cov2d ~ (f*s/z)^2 + 0.3
        s, z, f = 0.1, 4.0, 500.0
        cov3d = compute_cov3d(jnp.full((1, 3), s), jnp.array([[1.0, 0, 0, 0]]))
        w2c = jnp.eye(4)
        c2 = compute_cov2d(jnp.array([[0, 0, z]]), cov3d, w2c, f, f, 0.5, 0.5)
        expected = (f * s / z) ** 2 + 0.3
        np.testing.assert_allclose(c2[0, 0], expected, rtol=1e-4)
        np.testing.assert_allclose(c2[0, 2], expected, rtol=1e-4)
        np.testing.assert_allclose(c2[0, 1], 0.0, atol=1e-5)

    def test_conic_radius(self):
        cov2d = jnp.array([[4.0, 0.0, 1.0]])
        conic, radius, valid = conic_and_radius(cov2d)
        np.testing.assert_allclose(conic[0], [0.25, 0, 1.0], atol=1e-6)
        assert float(radius[0]) == 6.0  # ceil(3*sqrt(4))
        assert bool(valid[0])

    def test_conic_degenerate(self):
        cov2d = jnp.array([[1.0, 1.0, 1.0]])  # det == 0
        _, radius, valid = conic_and_radius(cov2d)
        assert not bool(valid[0])
        assert float(radius[0]) == 0.0
