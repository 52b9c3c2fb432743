import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.models.vggt import (VGGT, VGGTConfig, Aggregator,
                                        pose_encoding_to_extri_intri,
                                        unproject_depth_to_points, rope_2d)
from langscenex_tpu.ops.quat import quat_to_rotmat

TINY = VGGTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                  num_heads=2, num_register_tokens=2, camera_trunk_depth=1,
                  camera_iterations=2)


class TestVGGT:
    def test_forward_shapes(self):
        model = VGGT(TINY)
        imgs = jnp.zeros((1, 3, 3, 28, 42))   # B=1, S=3 frames
        params = model.init(jax.random.PRNGKey(0), imgs)
        out = model.apply(params, imgs)
        assert out["pose_enc"].shape == (1, 3, 9)
        assert out["depth"].shape == (1, 3, 28, 42)
        assert out["depth_conf"].shape == (1, 3, 28, 42)
        assert np.all(np.isfinite(np.asarray(out["pose_enc"])))

    def test_frame_permutation_changes_global(self):
        """Global attention mixes frames: permuting frames must change
        per-frame outputs (they see different context)."""
        model = VGGT(TINY)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(size=(1, 3, 3, 28, 28)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), imgs)
        o1 = model.apply(params, imgs)["depth"]
        imgs2 = imgs[:, ::-1]
        o2 = model.apply(params, imgs2)["depth"]
        # frame 0 of o1 vs frame 2 of o2 = same image, different context
        assert not np.allclose(np.asarray(o1[0, 0]), np.asarray(o2[0, 2]),
                               atol=1e-5)

    def test_pose_decoding(self):
        # identity quat, zero translation, 90deg fovs
        enc = jnp.array([[0.0, 0, 0, 1, 0, 0, 0, np.pi / 2, np.pi / 2]])
        extri, K = pose_encoding_to_extri_intri(enc, (480, 720))
        np.testing.assert_allclose(np.asarray(extri[0, :, :3]), np.eye(3),
                                   atol=1e-6)
        np.testing.assert_allclose(float(K[0, 1, 1]), 240.0, rtol=1e-5)
        np.testing.assert_allclose(float(K[0, 0, 0]), 360.0, rtol=1e-5)

    def test_unproject_roundtrip(self):
        H, W = 8, 12
        K = jnp.array([[50.0, 0, 6], [0, 50.0, 4], [0, 0, 1]])
        extri = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
        depth = jnp.full((H, W), 2.0)
        pts = unproject_depth_to_points(depth, extri, K)
        # center pixel -> (0, 0, 2)
        np.testing.assert_allclose(np.asarray(pts[4, 6]), [0, 0, 2], atol=1e-5)
        # all depths = 2 in camera frame
        np.testing.assert_allclose(np.asarray(pts[..., 2]), 2.0, atol=1e-5)

    def test_rope2d_norm_preserving(self):
        cos, sin = rope_2d(100.0, 2, 3, 16)
        assert cos.shape == (6, 8)
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 1, 6, 16)).astype(np.float32))
        from langscenex_tpu.models.vggt import _apply_rope_pairs
        rx = _apply_rope_pairs(x, cos, sin)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rx), axis=-1),
                                   np.linalg.norm(np.asarray(x), axis=-1),
                                   rtol=1e-5)
