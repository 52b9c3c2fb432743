import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.models.sam2.hiera import (Hiera, HieraConfig,
                                              ImageEncoder, sine_pos_embed,
                                              window_partition,
                                              window_unpartition)
from langscenex_tpu.models.sam2.decoder import (DecoderConfig, MaskDecoder,
                                                PromptEncoder,
                                                RandomPositionEncoding)
from langscenex_tpu.models.sam2.memory import (MemoryConfig, MemoryEncoder,
                                               MemoryAttention, init_bank,
                                               bank_insert, bank_as_memory)
from langscenex_tpu.models.sam2.model import SAM2, SAM2Config, \
    SAM2VideoPredictor
from langscenex_tpu.models.sam2.amg import (AutomaticMaskGenerator,
                                            AMGConfig, point_grid,
                                            stability_score)
from langscenex_tpu.ops.connected import (connected_components,
                                          remove_small_regions, mask_nms,
                                          mask_iou_matrix)

TINY = SAM2Config(
    hiera=HieraConfig(embed_dim=8, num_heads=1, stages=(1, 1, 1, 1),
                      global_att_blocks=(3,), window_spec=(4, 4, 2, 2),
                      neck_dim=32),
    decoder=DecoderConfig(dim=32, num_heads=2, mlp_dim=64, depth=1,
                          num_multimask=3),
    memory=MemoryConfig(dim=32, mem_dim=16, num_heads=2, depth=1,
                        num_maskmem=3))


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
        # stages: /4, /8, /16, /32
        assert out["backbone_fpn"][0].shape[1] == 16
        assert out["vision_feats"].shape == (1, 4, 4, 32)
        assert out["vision_pos"].shape == (4, 4, 32)


class TestDecoder:
    def test_mask_decoder_shapes(self):
        dec = MaskDecoder(TINY.decoder)
        B, H, W, C = 2, 8, 8, 32
        rng = np.random.default_rng(1)
        feat = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        pe = sine_pos_embed(H, W, C)
        sparse = jnp.asarray(rng.normal(size=(B, 2, C)).astype(np.float32))
        dense = jnp.zeros((B, H, W, C))
        params = dec.init(jax.random.PRNGKey(0), feat, pe, sparse, dense)
        masks, iou, tok = dec.apply(params, feat, pe, sparse, dense, True)
        assert masks.shape == (B, 3, 32, 32)
        assert iou.shape == (B, 3)
        m1, i1, _ = dec.apply(params, feat, pe, sparse, dense, False)
        assert m1.shape == (B, 1, 32, 32)

    def test_prompt_encoder(self):
        pe = PromptEncoder(TINY.decoder)
        coords = jnp.array([[[0.5, 0.5], [0.2, 0.8]]])
        labels = jnp.array([[1, 0]])
        params = pe.init(jax.random.PRNGKey(0), coords, labels, None, (8, 8))
        sparse, dense = pe.apply(params, coords, labels, None, (8, 8))
        assert sparse.shape == (1, 2, 32)
        assert dense.shape[1:] == (8, 8, 32)
        # positive vs negative labels produce different embeddings
        assert not np.allclose(np.asarray(sparse[0, 0]),
                               np.asarray(sparse[0, 1]))


class TestMemory:
    def test_memory_encoder(self):
        me = MemoryEncoder(TINY.memory)
        feat = jnp.zeros((1, 4, 4, 32))
        mask = jnp.zeros((1, 1, 64, 64))
        params = me.init(jax.random.PRNGKey(0), feat, mask)
        out = me.apply(params, feat, mask)
        assert out.shape == (1, 4, 4, 16)

    def test_memory_attention_conditions(self):
        ma = MemoryAttention(TINY.memory)
        rng = np.random.default_rng(2)
        feat = jnp.asarray(rng.normal(size=(1, 4, 4, 32)).astype(np.float32))
        pos = sine_pos_embed(4, 4, 32)
        mem1 = jnp.zeros((1, 8, 16))
        mem2 = jnp.asarray(rng.normal(size=(1, 8, 16)).astype(np.float32))
        params = ma.init(jax.random.PRNGKey(0), feat, pos, mem1,
                         jnp.zeros_like(mem1))
        o1 = ma.apply(params, feat, pos, mem1, jnp.zeros_like(mem1))
        o2 = ma.apply(params, feat, pos, mem2, jnp.zeros_like(mem2))
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_bank_ring(self):
        bank = init_bank(2, 3, 16, 8)           # 2 objects, 3 slots
        f = jnp.ones((2, 16, 8))
        bank = bank_insert(bank, f, f, is_cond=True)
        assert bool(bank.valid[0, 0]) and not bool(bank.valid[0, 1])
        bank = bank_insert(bank, 2 * f, f, is_cond=False)
        bank = bank_insert(bank, 3 * f, f, is_cond=False)
        bank = bank_insert(bank, 4 * f, f, is_cond=False)  # wraps to slot 1
        assert float(bank.feats[0, 1, 0, 0]) == 4.0
        assert float(bank.feats[0, 0, 0, 0]) == 1.0   # cond slot pinned
        mem, _ = bank_as_memory(bank)
        assert mem.shape == (2, 48, 8)


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
        clean = np.asarray(remove_small_regions(jnp.asarray(m), 4, "islands"))
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


class TestEndToEnd:
    @staticmethod
    def _init_full(model, img):
        """Initialize every submodule via one wrapper call."""
        class WrapModel(type(model)):
            def __call__(self, img):
                feats = self.encode_image(img)
                vf = feats["vision_feats"]
                coords = jnp.zeros((1, 1, 2))
                labels = jnp.full((1, 1), -1, jnp.int32)
                mprompt = jnp.zeros((1, 1, vf.shape[1] * 4, vf.shape[2] * 4))
                masks, iou, tok = self.decode_masks(vf, coords, labels,
                                                    mprompt, False)
                mem = self.encode_memory(vf, masks)
                hw = vf.shape[1] * vf.shape[2]
                cond = self.condition_on_memory(
                    vf, feats["vision_pos"][None],
                    mem.reshape(1, hw, -1), jnp.zeros((1, hw, 16)))
                return masks
        wrap = WrapModel(model.cfg)
        params = wrap.init(jax.random.PRNGKey(0), img)
        return wrap, params

    def test_amg_on_random_weights(self):
        model = SAM2(TINY)
        img_np = np.random.default_rng(3).uniform(
            0, 1, (3, 64, 64)).astype(np.float32)
        wrap, params = self._init_full(model, jnp.asarray(img_np[None]))
        amg = AutomaticMaskGenerator(
            wrap, params,
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
        frames = np.random.default_rng(4).uniform(
            0, 1, (3, 3, 64, 64)).astype(np.float32)

        wrap, params = self._init_full(model, jnp.asarray(frames[:1]))
        pred = SAM2VideoPredictor(wrap, params, (64, 64))
        state = pred.init_state(frames)
        seed_mask = np.zeros((64, 64), bool)
        seed_mask[20:40, 20:40] = True
        pred.add_new_mask(state, 0, obj_id=1, mask=seed_mask)
        results = list(pred.propagate_in_video(state))
        assert len(results) == 3
        t, ids, masks = results[0]
        assert ids == [1]
        assert masks.shape[0] == 1
        assert np.all(np.isfinite(masks))

