"""LSeg alternate language path (reference preprocessor.py:112-138,
229-255): VQ compressor conversion/shapes + the dim4 artifact contract.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from langscenex_tpu.models.vq_model import VQConfig, VQModel

TINY_VQ = VQConfig(in_channels=8, out_channels=8, latent_channels=4,
                   norm_num_groups=2, block_out_channels=(8, 6, 4),
                   layers_per_block=1, num_vq_embeddings=32)


class TestVQModel:
    def test_encode_shapes_and_downsampling(self):
        """3 blocks, downsample after the first two -> /4 spatial; the
        continuous latents are what the LSeg branch saves
        (preprocessor.py:250)."""
        m = VQModel(TINY_VQ)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 16, 24, 8)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        z = m.apply(params, x, method=m.encode)
        assert z.shape == (1, 4, 6, 4)
        assert np.all(np.isfinite(np.asarray(z)))

    def test_quantize_and_decode_roundtrip_shapes(self):
        m = VQModel(TINY_VQ)
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 16, 16, 8)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        z = m.apply(params, x, method=m.encode)
        zq, idx = m.apply(params, z, method=m.quantize)
        assert zq.shape == z.shape
        assert idx.shape == z.shape[:-1]
        assert int(idx.max()) < TINY_VQ.num_vq_embeddings
        # quantized rows ARE codebook rows
        cb = np.asarray(params["params"]["codebook"])
        got = np.asarray(zq).reshape(-1, 4)
        want = cb[np.asarray(idx).reshape(-1)]
        np.testing.assert_allclose(got, want, rtol=1e-6)
        y = m.apply(params, x)
        assert y.shape == x.shape

    def test_conversion_matches_init_tree(self):
        """Synthetic diffusers-VQModel-layout state_dict converts into a
        tree matching the flax init exactly (paths + shapes) and runs."""
        from langscenex_tpu.utils.convert import convert_vq_model
        cfg = TINY_VQ
        rng = np.random.default_rng(2)

        def r(*shape):
            return rng.normal(0, 0.02, shape).astype(np.float32)

        ch = cfg.block_out_channels
        sd = {
            "encoder.conv_in.weight": r(ch[0], cfg.in_channels, 3, 3),
            "encoder.conv_in.bias": r(ch[0]),
            "encoder.conv_norm_out.weight": r(ch[-1]),
            "encoder.conv_norm_out.bias": r(ch[-1]),
            "encoder.conv_out.weight": r(cfg.latent_channels, ch[-1], 3, 3),
            "encoder.conv_out.bias": r(cfg.latent_channels),
            "quant_conv.weight": r(4, 4, 1, 1), "quant_conv.bias": r(4),
            "post_quant_conv.weight": r(4, 4, 1, 1),
            "post_quant_conv.bias": r(4),
            "quantize.embedding.weight": r(cfg.num_vq_embeddings, 4),
        }

        def resnet(prefix, cin, cout, spatial):
            for nm, c in (("norm1", cin), ("norm2", cout)):
                if spatial:
                    sd[f"{prefix}.{nm}.norm_layer.weight"] = r(c)
                    sd[f"{prefix}.{nm}.norm_layer.bias"] = r(c)
                    sd[f"{prefix}.{nm}.conv_y.weight"] = r(c, 4, 1, 1)
                    sd[f"{prefix}.{nm}.conv_y.bias"] = r(c)
                    sd[f"{prefix}.{nm}.conv_b.weight"] = r(c, 4, 1, 1)
                    sd[f"{prefix}.{nm}.conv_b.bias"] = r(c)
                else:
                    sd[f"{prefix}.{nm}.weight"] = r(c)
                    sd[f"{prefix}.{nm}.bias"] = r(c)
            sd[f"{prefix}.conv1.weight"] = r(cout, cin, 3, 3)
            sd[f"{prefix}.conv1.bias"] = r(cout)
            sd[f"{prefix}.conv2.weight"] = r(cout, cout, 3, 3)
            sd[f"{prefix}.conv2.bias"] = r(cout)
            if cin != cout:
                sd[f"{prefix}.conv_shortcut.weight"] = r(cout, cin, 1, 1)
                sd[f"{prefix}.conv_shortcut.bias"] = r(cout)

        def attn(prefix, c, spatial):
            if spatial:
                sd[f"{prefix}.spatial_norm.norm_layer.weight"] = r(c)
                sd[f"{prefix}.spatial_norm.norm_layer.bias"] = r(c)
                sd[f"{prefix}.spatial_norm.conv_y.weight"] = r(c, 4, 1, 1)
                sd[f"{prefix}.spatial_norm.conv_y.bias"] = r(c)
                sd[f"{prefix}.spatial_norm.conv_b.weight"] = r(c, 4, 1, 1)
                sd[f"{prefix}.spatial_norm.conv_b.bias"] = r(c)
            else:
                sd[f"{prefix}.group_norm.weight"] = r(c)
                sd[f"{prefix}.group_norm.bias"] = r(c)
            for nm in ("to_q", "to_k", "to_v"):
                sd[f"{prefix}.{nm}.weight"] = r(c, c)
                sd[f"{prefix}.{nm}.bias"] = r(c)
            sd[f"{prefix}.to_out.0.weight"] = r(c, c)
            sd[f"{prefix}.to_out.0.bias"] = r(c)

        prev = ch[0]
        for i, c in enumerate(ch):
            resnet(f"encoder.down_blocks.{i}.resnets.0", prev, c, False)
            if i < len(ch) - 1:
                sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = \
                    r(c, c, 3, 3)
                sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = r(c)
            prev = c
        resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1], False)
        resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1], False)
        attn("encoder.mid_block.attentions.0", ch[-1], False)

        rev = list(reversed(ch))
        sd["decoder.conv_in.weight"] = r(rev[0], 4, 3, 3)
        sd["decoder.conv_in.bias"] = r(rev[0])
        resnet("decoder.mid_block.resnets.0", rev[0], rev[0], True)
        resnet("decoder.mid_block.resnets.1", rev[0], rev[0], True)
        attn("decoder.mid_block.attentions.0", rev[0], True)
        prev = rev[0]
        for i, c in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                       prev if j == 0 else c, c, True)
            if i < len(rev) - 1:
                sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = \
                    r(c, c, 3, 3)
                sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = r(c)
            prev = c
        sd["decoder.conv_norm_out.norm_layer.weight"] = r(rev[-1])
        sd["decoder.conv_norm_out.norm_layer.bias"] = r(rev[-1])
        sd["decoder.conv_norm_out.conv_y.weight"] = r(rev[-1], 4, 1, 1)
        sd["decoder.conv_norm_out.conv_y.bias"] = r(rev[-1])
        sd["decoder.conv_norm_out.conv_b.weight"] = r(rev[-1], 4, 1, 1)
        sd["decoder.conv_norm_out.conv_b.bias"] = r(rev[-1])
        sd["decoder.conv_out.weight"] = r(cfg.out_channels, rev[-1], 3, 3)
        sd["decoder.conv_out.bias"] = r(cfg.out_channels)

        converted = convert_vq_model(sd)
        m = VQModel(cfg)
        x = jnp.zeros((1, 16, 16, cfg.in_channels))
        ref = m.init(jax.random.PRNGKey(0), x)
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
        got_shapes = jax.tree_util.tree_map(
            lambda a: np.asarray(a).shape, converted)
        assert ref_shapes == got_shapes
        y = m.apply(jax.tree_util.tree_map(jnp.asarray, converted), x)
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))


class TestLSegBranch:
    def test_generate_dim4_artifacts(self, tmp_path):
        """generate_lang_features_with_lseg mirrors the reference's
        surface: input/ frames -> lang_features_dim4/{name}_f.npy with
        the [1, 4, h, w] layout (preprocessor.py:243-255)."""
        from PIL import Image
        from langscenex_tpu.models.clip_dense import CLIPVisionConfig
        from langscenex_tpu.models.lseg import (
            LSegFeatureExtractor, generate_lang_features_with_lseg)

        root = str(tmp_path)
        os.makedirs(os.path.join(root, "input"))
        rng = np.random.default_rng(0)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (24, 32, 3), np.uint8)
                            ).save(os.path.join(root, "input",
                                                f"{i:04d}.png"))

        ccfg = CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                num_layers=2, num_heads=2, patch_size=8,
                                image_size=32, projection_dim=12)
        import flax.linen as nn  # noqa: F401  (params init below)
        from langscenex_tpu.models.clip_dense import CLIPVisionDense
        params = CLIPVisionDense(ccfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
        lseg = LSegFeatureExtractor(params, ccfg, out_dim=16)

        vq_cfg = VQConfig(in_channels=16, out_channels=16,
                          latent_channels=4, norm_num_groups=2,
                          block_out_channels=(8, 6, 4),
                          num_vq_embeddings=16)
        vq = VQModel(vq_cfg)
        vq_params = vq.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 16, 16, 16)))

        n = generate_lang_features_with_lseg(
            root, lseg, vq, vq_params, resolution=(32, 24))
        assert n == 2
        for i in range(2):
            p = os.path.join(root, "lang_features_dim4", f"{i:04d}_f.npy")
            assert os.path.exists(p)
            z = np.load(p)
            assert z.ndim == 4 and z.shape[:2] == (1, 4)
            assert np.all(np.isfinite(z))


class TestPipelineDispatch:
    def test_lseg_type_routes_and_degrades_gracefully(self, tmp_path):
        """feature_extractor_type='lseg' routes extract_language_features
        to the LSeg branch; with no checkpoints it logs + returns
        (mirrors the dim3 path's no-extractor degradation)."""
        from langscenex_tpu.pipeline import (FieldConstructionPipeline,
                                             PipelinePaths)
        pipe = FieldConstructionPipeline(
            PipelinePaths(data_path=str(tmp_path),
                          skip_video_process=True,
                          skip_pose_estimate=True,
                          feature_extractor_type="lseg"))
        pipe.extract_language_features()   # must not raise
        assert not os.path.isdir(os.path.join(str(tmp_path),
                                              "lang_features_dim4"))
