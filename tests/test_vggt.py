"""VGGT: behavior tests on a tiny config + numerical cross-validation of
utils/convert.convert_vggt against a random-init torch mirror with the
facebook/VGGT-1B state_dict key layout (the test_t5.py pattern)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.models.vggt import (VGGT, VGGTConfig, Aggregator,
                                        apply_rope_2d,
                                        pose_encoding_to_extri_intri,
                                        resize_bilinear_ac,
                                        unproject_depth_to_points)

TINY = VGGTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                  num_heads=2, num_register_tokens=2,
                  vit_embed_dim=32, vit_depth=2, vit_num_heads=2,
                  camera_trunk_depth=1, camera_iterations=2,
                  intermediate_layers=(0, 0, 1, 1),
                  dpt_features=16, dpt_out_channels=(16, 16, 16, 16),
                  enable_point_head=False)


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
        # depth is exp-activated, conf is 1+exp: both positive
        assert float(out["depth"].min()) > 0
        assert float(out["depth_conf"].min()) > 1.0

    def test_frame_permutation_changes_global(self):
        """Global attention mixes frames: permuting frames must change
        per-frame outputs (they see different context)."""
        model = VGGT(TINY)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(
            rng.uniform(0, 1, (1, 3, 3, 28, 28)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), imgs)
        o1 = model.apply(params, imgs)["depth"]
        imgs2 = imgs[:, ::-1]
        o2 = model.apply(params, imgs2)["depth"]
        # frame 0 of o1 vs frame 2 of o2 = same image, different context
        assert not np.allclose(np.asarray(o1[0, 0]), np.asarray(o2[0, 2]),
                               atol=1e-5)

    def test_first_frame_anchor_tokens(self):
        """Frame 0 gets the dedicated camera/register tokens: swapping the
        first two identical frames still differs from treating both as
        'other' frames (sel = [0, 1, 1, ...])."""
        model = VGGT(TINY)
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (1, 1, 3, 28, 28)).astype(np.float32)
        imgs = jnp.asarray(np.concatenate([img, img], axis=1))
        params = model.init(jax.random.PRNGKey(0), imgs)
        pose = np.asarray(model.apply(params, imgs)["pose_enc"])
        # identical images but different special tokens -> different poses
        assert not np.allclose(pose[0, 0], pose[0, 1], atol=1e-6)

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
        np.testing.assert_allclose(np.asarray(pts[4, 6]), [0, 0, 2],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pts[..., 2]), 2.0, atol=1e-5)

    def test_rope_identity_at_zero(self):
        """Position 0 = identity rotation (special tokens unrotated)."""
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 2, 4, 16)).astype(np.float32))
        pos = jnp.zeros((4, 2))
        np.testing.assert_allclose(np.asarray(apply_rope_2d(x, pos, 100.0)),
                                   np.asarray(x), atol=1e-6)

    def test_rope_norm_preserving(self):
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 2, 6, 16)).astype(np.float32))
        pos = jnp.asarray(np.random.default_rng(2).integers(
            0, 8, (6, 2)).astype(np.float32))
        rx = apply_rope_2d(x, pos, 100.0)
        # each half rotates pairs -> per-half norms preserved
        for sl in (slice(0, 8), slice(8, 16)):
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(rx[..., sl]), axis=-1),
                np.linalg.norm(np.asarray(x[..., sl]), axis=-1), rtol=1e-5)

    def test_resize_bilinear_align_corners(self):
        """Corners map to corners; linear ramps stay exact."""
        H, W = 3, 4
        x = (jnp.arange(H)[:, None] * 2.0 +
             jnp.arange(W)[None, :])[None, :, :, None]
        y = resize_bilinear_ac(x, (5, 7))
        assert y.shape == (1, 5, 7, 1)
        np.testing.assert_allclose(float(y[0, 0, 0, 0]), float(x[0, 0, 0, 0]),
                                   atol=1e-6)
        np.testing.assert_allclose(float(y[0, -1, -1, 0]),
                                   float(x[0, -1, -1, 0]), atol=1e-6)
        # a bilinear function is reproduced exactly
        exp = (jnp.arange(5) * (H - 1) / 4.0)[:, None] * 2.0 + \
            (jnp.arange(7) * (W - 1) / 6.0)[None, :]
        np.testing.assert_allclose(np.asarray(y[0, :, :, 0]),
                                   np.asarray(exp), atol=1e-5)


class TestVGGTConversion:
    """convert_vggt cross-validated numerically against the torch mirror
    (exact VGGT-1B state_dict key layout) at random init."""

    def _mirror_cfg(self):
        return {"patch": 14, "dim": 32, "depth": 2, "heads": 2,
                "n_reg": 2, "rope_freq": 100.0, "vit_dim": 32,
                "vit_depth": 2, "vit_heads": 2, "pos_grid": 2,
                "trunk_depth": 1, "iterations": 2,
                "inter_layers": [0, 0, 1, 1], "dpt_oc": [16, 16, 16, 16],
                "dpt_f": 16}

    def _flax_cfg(self):
        return VGGTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                          num_heads=2, num_register_tokens=2,
                          vit_embed_dim=32, vit_depth=2, vit_num_heads=2,
                          camera_trunk_depth=1, camera_iterations=2,
                          intermediate_layers=(0, 0, 1, 1),
                          dpt_features=16, dpt_out_channels=(16, 16, 16, 16))

    def test_matches_torch_mirror(self):
        torch = pytest.importorskip("torch")
        from torch_vggt_mirror import VGGTMirror
        from langscenex_tpu.utils.convert import convert_vggt

        torch.manual_seed(0)
        mirror = VGGTMirror(self._mirror_cfg()).eval()
        sd = {k: v.numpy() for k, v in mirror.state_dict().items()}

        rng = np.random.default_rng(3)
        imgs = rng.uniform(0, 1, (1, 2, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            ref = mirror(torch.tensor(imgs))

        model = VGGT(self._flax_cfg())
        variables = jax.tree_util.tree_map(jnp.asarray, convert_vggt(sd))
        out = model.apply(variables, jnp.asarray(imgs))

        np.testing.assert_allclose(np.asarray(out["pose_enc"]),
                                   ref["pose_enc"].numpy(),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["depth"]),
                                   ref["depth"].numpy(),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["depth_conf"]),
                                   ref["depth_conf"].numpy(),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["world_points"]),
                                   ref["world_points"].numpy(),
                                   atol=5e-4, rtol=1e-3)

    def test_conversion_tree_matches_init(self):
        """Converted tree has exactly the structure model.init produces —
        no missing and no extra leaves (flax apply is strict)."""
        torch = pytest.importorskip("torch")
        from torch_vggt_mirror import VGGTMirror
        from langscenex_tpu.utils.convert import convert_vggt

        torch.manual_seed(1)
        mirror = VGGTMirror(self._mirror_cfg())
        sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
        converted = convert_vggt(sd)

        model = VGGT(self._flax_cfg())
        init = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 2, 3, 28, 28)))
        flat_c = jax.tree_util.tree_leaves_with_path(converted)
        flat_i = jax.tree_util.tree_leaves_with_path(init)
        paths_c = {jax.tree_util.keystr(p) for p, _ in flat_c}
        paths_i = {jax.tree_util.keystr(p) for p, _ in flat_i}
        assert paths_c == paths_i, (
            f"missing={sorted(paths_i - paths_c)[:5]} "
            f"extra={sorted(paths_c - paths_i)[:5]}")
        shapes_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_c}
        shapes_i = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_i}
        assert shapes_c == shapes_i


class TestTrackHead:
    """Track head (vggt/heads/track_head.py): converter numeric parity vs
    the torch mirror + behavior checks."""

    def _tiny(self):
        import torch
        from torch_vggt_mirror import TrackHeadMirror
        torch.manual_seed(3)
        # dim_in=2C=64, patch 14, layers over 2 inters, oc 16, f=8
        return TrackHeadMirror(dim_in=64, patch=14, layers=(0, 0, 1, 1),
                               oc=(16, 16, 16, 16), f=8, hidden=16,
                               depth=2, levels=2, radius=1, iters=2,
                               heads=2, n_virtual=3).eval()

    def test_converter_matches_torch(self):
        import torch
        from langscenex_tpu.models.vggt import TrackHead
        from langscenex_tpu.utils.convert import _vggt_track_head

        tm = self._tiny()
        sd = {f"track_head.{k}": np.asarray(v)
              for k, v in tm.state_dict().items()}
        params = _vggt_track_head(sd)

        cfg = VGGTConfig(img_size=28, patch_size=14, embed_dim=32,
                         depth=2, num_heads=2,
                         intermediate_layers=(0, 0, 1, 1),
                         dpt_features=8, dpt_out_channels=(16, 16, 16, 16),
                         enable_track_head=True, track_features=8,
                         track_iters=2, track_corr_levels=2,
                         track_corr_radius=1, track_depth=2,
                         track_hidden=16, track_virtual=3,
                         track_num_heads=2)
        rng = np.random.default_rng(0)
        B, S, Hp, Wp = 1, 3, 2, 4
        inters = [rng.normal(size=(B, S, Hp * Wp, 64)).astype(np.float32)
                  for _ in range(2)]
        q = np.array([[[6.0, 9.0], [20.0, 14.0]]], np.float32)
        with torch.no_grad():
            t_int = [torch.from_numpy(
                np.concatenate([np.zeros((B, S, 1, 64), np.float32), x],
                               axis=2)) for x in inters]
            imgs = torch.zeros(B, S, 3, Hp * 14, Wp * 14)
            preds, vis, conf = tm(t_int, imgs, 1, torch.from_numpy(q))

        head = TrackHead(cfg)
        flax_in = [jnp.asarray(x) for x in (inters[0], inters[0],
                                            inters[1], inters[1])]
        out_preds, out_vis, out_conf = head.apply(
            {"params": params}, flax_in, (Hp, Wp), (Hp * 14, Wp * 14),
            jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(out_preds[-1]),
                                   preds[-1].numpy(), atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out_vis), vis.numpy(),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(out_conf), conf.numpy(),
                                   atol=5e-4)

    def test_full_model_track_output(self):
        cfg = VGGTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                         num_heads=2, num_register_tokens=2,
                         vit_embed_dim=32, vit_depth=2, vit_num_heads=2,
                         camera_trunk_depth=1, camera_iterations=2,
                         intermediate_layers=(0, 0, 1, 1),
                         dpt_features=16, dpt_out_channels=(16, 16, 16, 16),
                         enable_point_head=False, enable_track_head=True,
                         track_features=16, track_iters=2,
                         track_corr_levels=2, track_corr_radius=2,
                         track_depth=2, track_hidden=32, track_virtual=4,
                         track_num_heads=2)
        m = VGGT(cfg)
        imgs = jnp.zeros((1, 3, 3, 28, 42))
        qp = jnp.asarray([[[5.0, 6.0], [10.0, 12.0]]])
        params = m.init(jax.random.PRNGKey(0), imgs, qp)
        out = m.apply(params, imgs, qp)
        assert out["track"].shape == (1, 3, 2, 2)
        assert out["vis"].shape == (1, 3, 2)
        # frame 0 pinned to the query points (:186-189)
        np.testing.assert_allclose(np.asarray(out["track"][0, 0]),
                                   [[5, 6], [10, 12]], atol=1e-4)
