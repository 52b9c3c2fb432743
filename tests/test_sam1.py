"""SAM v1 (ViT-det encoder + decoder + modified 4-level AMG): behavior
tests and numerical cross-validation of utils/convert.convert_sam1
against a torch mirror with the sam_vit_h_4b8939.pth key layout."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.models.sam1 import (SAM1, SAM1Config, ImageEncoderViT,
                                        SAM1AutomaticMaskGenerator,
                                        SAM1AMGConfig, build_point_grid,
                                        generate_crop_boxes, _get_rel_pos)

TINY = SAM1Config(img_size=64, patch_size=16, embed_dim=16, depth=2,
                  num_heads=2, out_chans=32, window_size=2,
                  global_attn_indexes=(1,), decoder_dim=32,
                  decoder_heads=2, decoder_mlp=64, decoder_depth=1)

MIRROR_CFG = {"img_size": 64, "patch": 16, "dim": 16, "depth": 2,
              "heads": 2, "out_chans": 32, "window": 2, "global_idx": (1,),
              "dec_heads": 2, "dec_mlp": 64, "dec_depth": 1}


def _init_sam1(model, key=0):
    img = jnp.zeros((1, 3, 64, 64))

    def init_all(mdl, img):
        feats = mdl.encode_image(img)
        coords = jnp.zeros((1, 1, 2))
        labels = jnp.ones((1, 1), jnp.int32)
        return mdl.decode_points(feats, coords, labels, True)

    return SAM1.init(model, jax.random.PRNGKey(key), img, method=init_all)


class TestSAM1:
    def test_encoder_shapes(self):
        enc = ImageEncoderViT(TINY)
        img = jnp.zeros((1, 3, 64, 64))
        params = enc.init(jax.random.PRNGKey(0), img)
        out = enc.apply(params, img)
        assert out.shape == (1, 4, 4, 32)

    def test_rel_pos_identity_size(self):
        rel = jnp.asarray(np.random.default_rng(0).normal(
            size=(7, 8)).astype(np.float32))
        R = _get_rel_pos(4, 4, rel)
        assert R.shape == (4, 4, 8)
        # diagonal = offset 0 = center entry
        np.testing.assert_allclose(np.asarray(R[2, 2]), np.asarray(rel[3]),
                                   atol=1e-6)

    def test_rel_pos_interpolated(self):
        rel = jnp.asarray(np.random.default_rng(1).normal(
            size=(5, 4)).astype(np.float32))
        R = _get_rel_pos(4, 4, rel)    # table resized 5 -> 7
        assert R.shape == (4, 4, 4)
        assert np.isfinite(np.asarray(R)).all()

    def test_decode_shapes(self):
        model = SAM1(TINY)
        params = _init_sam1(model)
        feats = jnp.zeros((2, 4, 4, 32))
        coords = jnp.zeros((2, 1, 2))
        labels = jnp.ones((2, 1), jnp.int32)
        masks, ious = model.apply(params, feats, coords, labels, True,
                                  method=SAM1.decode_points)
        assert masks.shape == (2, 3, 16, 16)
        assert ious.shape == (2, 3)

    def test_crop_boxes(self):
        boxes = generate_crop_boxes(100, 150, 1, 0.34)
        assert boxes[0] == (0, 0, 150, 100)
        assert len(boxes) == 5
        for x0, y0, x1, y1 in boxes:
            assert 0 <= x0 < x1 <= 150 and 0 <= y0 < y1 <= 100

    def test_point_grid(self):
        g = build_point_grid(4)
        assert g.shape == (16, 2)
        assert g.min() > 0 and g.max() < 1


class TestSAM1AMG:
    def test_four_levels(self):
        model = SAM1(TINY)
        params = _init_sam1(model)
        amg = SAM1AutomaticMaskGenerator(
            model, params,
            SAM1AMGConfig(points_per_side=2, points_per_batch=4,
                          pred_iou_thresh=-1e9,
                          stability_score_thresh=-1e9, crop_n_layers=0,
                          min_mask_region_area=0))
        img = np.random.default_rng(2).uniform(
            0, 1, (3, 48, 64)).astype(np.float32)
        levels = amg.generate(img)
        assert len(levels) == 4
        # default level = all 3 tokens flattened (before NMS it would be
        # 3x a single-token level; NMS may prune)
        assert sum(len(l) for l in levels) > 0
        for lvl in levels:
            for e in lvl:
                assert e["segmentation"].shape == (48, 64)
                assert e["segmentation"].dtype == bool

    def test_crop_layer_runs(self):
        model = SAM1(TINY)
        params = _init_sam1(model)
        amg = SAM1AutomaticMaskGenerator(
            model, params,
            SAM1AMGConfig(points_per_side=2, points_per_batch=4,
                          pred_iou_thresh=-1e9,
                          stability_score_thresh=-1e9, crop_n_layers=1,
                          min_mask_region_area=0))
        img = np.random.default_rng(3).uniform(
            0, 1, (3, 40, 56)).astype(np.float32)
        levels = amg.generate(img)
        assert len(levels) == 4


class TestSAM1Conversion:
    def _pair(self, seed=0):
        torch = pytest.importorskip("torch")
        from torch_sam1_mirror import SAM1Mirror
        from langscenex_tpu.utils.convert import convert_sam1
        torch.manual_seed(seed)
        mirror = SAM1Mirror(MIRROR_CFG).eval()
        sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
        variables = jax.tree_util.tree_map(jnp.asarray, convert_sam1(sd))
        return mirror, variables

    def test_tree_matches_init(self):
        pytest.importorskip("torch")
        _, converted = self._pair()
        model = SAM1(TINY)
        init = _init_sam1(model)
        flat_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(converted)}
        flat_i = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(init)}
        assert flat_c == flat_i, (
            f"missing={sorted(set(flat_i) - set(flat_c))[:6]} "
            f"extra={sorted(set(flat_c) - set(flat_i))[:6]}")

    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        mirror, variables = self._pair(seed=1)
        model = SAM1(TINY)
        rng = np.random.default_rng(4)
        img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            t_feats = mirror.image_encoder(torch.tensor(img))
        f_feats = model.apply(variables, jnp.asarray(img),
                              method=SAM1.encode_image)
        np.testing.assert_allclose(
            np.asarray(f_feats).transpose(0, 3, 1, 2), t_feats.numpy(),
            atol=2e-4, rtol=1e-3)

        coords = rng.uniform(0, 64, (2, 1, 2)).astype(np.float32)
        labels = np.ones((2, 1), np.int64)
        featsB = np.broadcast_to(np.asarray(f_feats),
                                 (2,) + f_feats.shape[1:])
        with torch.no_grad():
            t_masks, t_iou = mirror.decode_points(
                t_feats.expand(2, -1, -1, -1), torch.tensor(coords),
                torch.tensor(labels), True)
        f_masks, f_iou = model.apply(
            variables, jnp.asarray(featsB), jnp.asarray(coords),
            jnp.asarray(labels.astype(np.int32)), True,
            method=SAM1.decode_points)
        np.testing.assert_allclose(np.asarray(f_masks), t_masks.numpy(),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(f_iou), t_iou.numpy(),
                                   atol=5e-4, rtol=1e-3)
