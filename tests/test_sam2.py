"""SAM2 video segmentation family: Hiera image encoder, prompt encoder,
mask decoder, streaming memory, video propagation, automatic mask
generation — plus numerical cross-validation of utils/convert.convert_sam2
against a random-init torch mirror with the sam2_hiera_large.pt state_dict
key layout (the test_t5.py pattern)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.models.sam2.hiera import (Hiera, HieraConfig,
                                              ImageEncoder, sine_pos_embed,
                                              window_partition,
                                              window_unpartition)
from langscenex_tpu.models.sam2.decoder import DecoderConfig
from langscenex_tpu.models.sam2.memory import (MemoryConfig,
                                               axial_rope_cos_sin,
                                               apply_rotary)
from langscenex_tpu.models.sam2.model import (SAM2, SAM2Config,
                                              SAM2VideoPredictor)
from langscenex_tpu.models.sam2.amg import (AutomaticMaskGenerator,
                                            AMGConfig, point_grid,
                                            stability_score)
from langscenex_tpu.ops.connected import (connected_components,
                                          remove_small_regions, mask_nms,
                                          mask_iou_matrix)

TINY = SAM2Config(
    hiera=HieraConfig(embed_dim=8, num_heads=1, stages=(1, 1, 1, 1),
                      global_att_blocks=(3,), window_spec=(4, 4, 2, 2),
                      pos_embed_bkg_size=(2, 2), neck_dim=32),
    decoder=DecoderConfig(dim=32, num_heads=2, mlp_dim=64, depth=1,
                          num_multimask=3),
    memory=MemoryConfig(dim=32, mem_dim=16, num_heads=1, depth=1,
                        ffn_dim=64, num_maskmem=3, max_obj_ptrs=4),
    image_size=64)

MIRROR_CFG = {
    "embed_dim": 8, "num_heads": 1, "stages": (1, 1, 1, 1),
    "global_att": (3,), "window_spec": (4, 4, 2, 2), "pos_bkg": (2, 2),
    "backbone_channel_list": [64, 32, 16, 8], "d_model": 32,
    "fpn_top_down_levels": [2, 3], "scalp": 1, "image_size": 64,
    "embed_hw": (4, 4), "dec_heads": 2, "dec_mlp": 64, "dec_depth": 1,
    "mem_heads": 1, "mem_ffn": 64, "mem_dim": 16, "mem_layers": 1,
    "num_maskmem": 3,
}


class TestHiera:
    def test_window_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 10, 14, 4)).astype(np.float32))
        w, padded = window_partition(x, 4)
        y = window_unpartition(w, 4, padded, (10, 14))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    def test_encoder_shapes(self):
        enc = ImageEncoder(TINY.hiera)
        img = jnp.zeros((1, 3, 64, 64))
        params = enc.init(jax.random.PRNGKey(0), img)
        out = enc.apply(params, img)
        # scalp=1: levels /4, /8, /16 remain
        assert len(out["backbone_fpn"]) == 3
        assert out["backbone_fpn"][0].shape == (1, 16, 16, 32)
        assert out["vision_features"].shape == (1, 4, 4, 32)
        assert out["vision_pos_enc"][-1].shape == (4, 4, 32)


class TestRope:
    def test_identity_at_origin(self):
        cos, sin = axial_rope_cos_sin(16, 4, 4, 10000.0)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 1, 16, 16)).astype(np.float32))
        r = apply_rotary(x, cos, sin)
        # token 0 is at (x=0, y=0): identity rotation
        np.testing.assert_allclose(np.asarray(r[0, 0, 0]),
                                   np.asarray(x[0, 0, 0]), atol=1e-6)

    def test_norm_preserving(self):
        cos, sin = axial_rope_cos_sin(16, 4, 4, 10000.0)
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 1, 16, 16)).astype(np.float32))
        r = apply_rotary(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(r), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)


class TestConnected:
    def test_two_components(self):
        m = np.zeros((8, 8), bool)
        m[1:3, 1:3] = True
        m[5:7, 5:7] = True
        labels = np.asarray(connected_components(jnp.asarray(m)))
        l1 = labels[1, 1]
        l2 = labels[5, 5]
        assert l1 != l2 and l1 >= 0 and l2 >= 0
        assert np.all(labels[1:3, 1:3] == l1)
        assert labels[0, 0] == -1

    def test_remove_small(self):
        m = np.zeros((16, 16), bool)
        m[2:12, 2:12] = True
        m[5, 5] = False         # 1px hole
        m[14, 14] = True        # 1px island
        filled = np.asarray(remove_small_regions(jnp.asarray(m), 4, "holes"))
        assert filled[5, 5]
        clean = np.asarray(remove_small_regions(jnp.asarray(m), 4,
                                                "islands"))
        assert not clean[14, 14]
        assert clean[3, 3]

    def test_mask_nms(self):
        m = np.zeros((3, 8, 8), bool)
        m[0, :4] = True
        m[1, :4] = True          # duplicate of 0
        m[2, 4:] = True          # distinct
        keep = np.asarray(mask_nms(jnp.asarray(m),
                                   jnp.array([0.9, 0.8, 0.7])))
        assert keep.tolist() == [True, False, True]

    def test_iou_matrix(self):
        m = np.zeros((2, 4, 4), bool)
        m[0, :2] = True
        m[1, 1:3] = True
        iou = np.asarray(mask_iou_matrix(jnp.asarray(m)))
        np.testing.assert_allclose(iou[0, 1], 4 / 12, atol=1e-6)


def _init_sam2(model, key=0):
    from langscenex_tpu.models.sam2.model import init_sam2_params
    return init_sam2_params(model, key)


class TestEndToEnd:
    def test_amg_on_random_weights(self):
        model = SAM2(TINY)
        params = _init_sam2(model)
        img_np = np.random.default_rng(3).uniform(
            0, 1, (3, 64, 64)).astype(np.float32)
        amg = AutomaticMaskGenerator(
            model, params,
            AMGConfig(points_per_side=4, points_per_batch=16,
                      pred_iou_thresh=-1e9, stability_score_thresh=-1e9,
                      min_mask_area=0))
        levels = amg.generate(img_np)
        assert len(levels) == 4
        total = sum(len(l) for l in levels)
        assert total > 0
        for lvl in levels:
            for e in lvl:
                assert e["segmentation"].shape == (16, 16)

    def test_video_predictor_smoke(self):
        model = SAM2(TINY)
        params = _init_sam2(model)
        frames = np.random.default_rng(4).uniform(
            0, 1, (3, 3, 64, 64)).astype(np.float32)
        pred = SAM2VideoPredictor(model, params)
        state = pred.init_state(frames)
        seed_mask = np.zeros((64, 64), np.float32)
        seed_mask[20:40, 20:40] = 1.0
        pred.add_new_mask(state, 0, obj_id=1, mask=seed_mask)
        results = list(pred.propagate_in_video(state))
        assert len(results) == 3
        t, ids, masks = results[0]
        assert ids == [1]
        assert masks.shape[0] == 1
        assert np.all(np.isfinite(masks))

    def test_video_predictor_two_groups(self):
        """Objects prompted on different frames form separate signature
        groups and still propagate."""
        model = SAM2(TINY)
        params = _init_sam2(model)
        frames = np.random.default_rng(5).uniform(
            0, 1, (3, 3, 64, 64)).astype(np.float32)
        pred = SAM2VideoPredictor(model, params)
        state = pred.init_state(frames)
        m = np.zeros((64, 64), np.float32)
        m[10:30, 10:30] = 1.0
        pred.add_new_mask(state, 0, obj_id=1, mask=m)
        pred.add_new_mask(state, 1, obj_id=2, mask=m[::-1].copy())
        results = {t: (ids, masks)
                   for t, ids, masks in pred.propagate_in_video(state)}
        assert set(results[2][0]) == {1, 2}
        assert results[2][1].shape[0] == 2


class TestSAM2Conversion:
    """convert_sam2 cross-validated numerically against the torch mirror
    (exact sam2_hiera_large.pt state_dict key layout) at random init."""

    def _mirror_and_params(self, seed=0):
        torch = pytest.importorskip("torch")
        from torch_sam2_mirror import SAM2Mirror
        from langscenex_tpu.utils.convert import convert_sam2
        torch.manual_seed(seed)
        mirror = SAM2Mirror(MIRROR_CFG).eval()
        # push object-score logits away from the 0 decision boundary so
        # tiny float diffs cannot flip the hard is_obj gate
        with torch.no_grad():
            mirror.sam_mask_decoder.pred_obj_score_head.layers[2].bias += 2.0
        sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
        variables = jax.tree_util.tree_map(jnp.asarray, convert_sam2(sd))
        return mirror, variables

    def test_conversion_tree_matches_init(self):
        pytest.importorskip("torch")
        _, converted = self._mirror_and_params()
        model = SAM2(TINY)
        init = _init_sam2(model)
        flat_c = jax.tree_util.tree_leaves_with_path(converted)
        flat_i = jax.tree_util.tree_leaves_with_path(init)
        paths_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_c}
        paths_i = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_i}
        assert paths_c == paths_i, (
            f"missing={sorted(set(paths_i) - set(paths_c))[:6]} "
            f"extra={sorted(set(paths_c) - set(paths_i))[:6]}")

    def test_image_encoder_matches(self):
        torch = pytest.importorskip("torch")
        mirror, variables = self._mirror_and_params()
        model = SAM2(TINY)
        rng = np.random.default_rng(7)
        img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref_feats, ref_pos = mirror.forward_image(torch.tensor(img))
        out = model.apply(variables, jnp.asarray(img),
                          method=SAM2.forward_image)
        for lvl in range(3):
            got = np.asarray(out["backbone_fpn"][lvl]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, ref_feats[lvl].numpy(),
                                       atol=2e-4, rtol=1e-3)
        got_pos = np.asarray(out["vision_pos_enc"][-1]).transpose(2, 0, 1)
        np.testing.assert_allclose(got_pos, ref_pos[-1][0].numpy(),
                                   atol=1e-5)

    def test_cond_and_track_steps_match(self):
        """Full video-step parity: mask-prompted frame (mask-as-output +
        memory encode) then a tracked frame (memory-conditioned SAM heads
        with spatial memories + object-pointer tokens)."""
        torch = pytest.importorskip("torch")
        mirror, variables = self._mirror_and_params(seed=1)
        model = SAM2(TINY)
        rng = np.random.default_rng(8)
        img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
        mask = np.zeros((1, 1, 64, 64), np.float32)
        mask[:, :, 16:48, 16:48] = 1.0

        # --- torch side
        with torch.no_grad():
            tf, tpos = mirror.forward_image(torch.tensor(img))
            t_low, t_high, t_ptr, _ = mirror.use_mask_as_output(
                tf[-1], [tf[0], tf[1]], torch.tensor(mask))
            t_mem = mirror.encode_new_memory(tf[-1], t_high, False)
            # assemble memory: 1 cond spatial memory + 1 obj ptr (2 tokens)
            hw = t_mem.shape[-2] * t_mem.shape[-1]
            mem_sp = t_mem.flatten(2).permute(0, 2, 1)     # [1, hw, 16]
            mem_pos = sine_pos_embed(4, 4, 16)
            mem_pos_t = torch.tensor(np.asarray(mem_pos).reshape(1, -1, 16))
            mem_pos_t = mem_pos_t + mirror.maskmem_tpos_enc[-1].reshape(
                1, 1, 16)
            ptr = t_ptr.reshape(1, 2, 16)                  # split 32 -> 2x16
            memory = torch.cat([mem_sp, ptr], 1)
            memory_pos = torch.cat([mem_pos_t, torch.zeros_like(ptr)], 1)
            t_cond = mirror.condition_features(tf[-1], tpos[-1], memory,
                                               memory_pos, 2)
            t_out = mirror.forward_sam_heads(
                t_cond, high_res_features=[tf[0], tf[1]],
                multimask_output=True)

        # --- flax side
        out = model.apply(variables, jnp.asarray(img),
                          method=SAM2.forward_image)
        fpn = out["backbone_fpn"]
        pos = out["vision_pos_enc"][-1]
        f_low, f_high, _, _, _, f_ptr, _ = model.apply(
            variables, fpn[-1], fpn[:2], jnp.asarray(mask),
            method=SAM2.use_mask_as_output)
        f_mem = model.apply(variables, fpn[-1], f_high, False,
                            method=SAM2.encode_new_memory)
        np.testing.assert_allclose(np.asarray(f_low)[:, 0],
                                   t_low.numpy()[:, 0], atol=2e-3)
        np.testing.assert_allclose(np.asarray(f_ptr), t_ptr.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(f_mem).transpose(0, 3, 1, 2), t_mem.numpy(),
            atol=2e-4, rtol=1e-3)

        mem_sp_f = np.asarray(f_mem).reshape(1, -1, 16)
        mem_pos_f = (np.asarray(sine_pos_embed(4, 4, 16)).reshape(1, -1, 16)
                     + np.asarray(
                         variables["params"]["maskmem_tpos_enc"])[-1]
                     .reshape(1, 1, 16))
        ptr_f = np.asarray(f_ptr).reshape(1, 2, 16)
        memory_f = jnp.asarray(np.concatenate([mem_sp_f, ptr_f], 1))
        memory_pos_f = jnp.asarray(
            np.concatenate([mem_pos_f, np.zeros_like(ptr_f)], 1))
        f_cond = model.apply(variables, fpn[-1], pos, memory_f,
                             memory_pos_f, 2,
                             method=SAM2.condition_features)
        np.testing.assert_allclose(
            np.asarray(f_cond).transpose(0, 3, 1, 2), t_cond.numpy(),
            atol=5e-4, rtol=1e-3)
        f_out = model.apply(variables, f_cond, None, None, None, fpn[:2],
                            True, method=SAM2.forward_sam_heads)
        np.testing.assert_allclose(np.asarray(f_out[0]),
                                   t_out[0].numpy(), atol=5e-3)
        np.testing.assert_allclose(np.asarray(f_out[2]),
                                   t_out[2].numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(f_out[5]),
                                   t_out[5].numpy(), atol=1e-3)
