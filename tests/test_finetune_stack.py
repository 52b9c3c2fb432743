import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from langscenex_tpu.models.cogvideox.losses import (
    vae_loss, VAELossConfig, kl_divergence, LeCamEMA, lecam_reg,
    discriminator_loss, generator_loss, r1_gradient_penalty,
    adaptive_generator_weight)
from langscenex_tpu.models.cogvideox.datasets import (
    VideoClipDataset, ClipSamplerConfig, AutoEncoderDataset,
    ImageFolderDataset, valid_clip_length)
from langscenex_tpu.models.lpips import LPIPS
from langscenex_tpu.utils.convert import (t2f_linear, t2f_conv,
                                          convert_autoencoder)
from langscenex_tpu.train.checkpoint import (save_checkpoint,
                                             restore_checkpoint,
                                             latest_iteration)


class TestLosses:
    def test_kl_zero_for_standard_normal(self):
        m = jnp.zeros((2, 8))
        lv = jnp.zeros((2, 8))
        assert float(kl_divergence(m, lv)) == pytest.approx(0.0, abs=1e-6)

    def test_vae_loss_components(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 3, 8, 8)).astype(np.float32))
        rec = x + 0.1
        total, parts = vae_loss(rec, x, jnp.zeros((2, 4)), jnp.zeros((2, 4)),
                                jnp.zeros(()))
        assert float(parts["kl"]) == pytest.approx(0.0, abs=1e-6)
        assert float(parts["nll"]) > 0

    def test_hinge_losses(self):
        d_real = jnp.array([2.0, 0.5])
        d_fake = jnp.array([-2.0, 0.5])
        dl = discriminator_loss(d_real, d_fake, "hinge")
        # real=2 -> 0; real=0.5 -> 0.5 ; fake=-2 -> 0; fake=0.5 -> 1.5
        assert float(dl) == pytest.approx(0.25 + 0.75)
        gl = generator_loss(d_fake, "hinge")
        assert float(gl) == pytest.approx(0.75)

    def test_lecam(self):
        ema = LeCamEMA(real=jnp.zeros(()), fake=jnp.zeros(()), decay=0.5)
        ema = ema.update(jnp.array([2.0]), jnp.array([-2.0]))
        assert float(ema.real) == pytest.approx(1.0)
        reg = lecam_reg(jnp.array([3.0]), jnp.array([-3.0]), ema)
        assert float(reg) > 0

    def test_r1_penalty(self):
        disc = lambda x: jnp.sum(x ** 2, axis=(1, 2, 3))
        x = jnp.ones((2, 1, 2, 2))
        # grad per x = 2x -> ||g||^2 summed = 4 * numel / batch
        p = r1_gradient_penalty(disc, x)
        assert float(p) == pytest.approx(4 * 8 / 2)

    def test_adaptive_weight(self):
        w = adaptive_generator_weight(jnp.array(2.0), jnp.array(0.5))
        assert float(w) == pytest.approx(2.0 / 0.5004, rel=1e-2)


class TestDatasets:
    def _make_frames(self, tmp_path, n=100):
        d = tmp_path / "vid"
        d.mkdir()
        for i in range(n):
            Image.fromarray(
                np.full((8, 12, 3), i % 255, np.uint8)).save(
                d / f"{i:04d}.png")
        return str(d)

    def test_valid_clip_length(self):
        assert valid_clip_length(49) == 49
        assert valid_clip_length(50) == 49
        assert valid_clip_length(17) == 17
        assert valid_clip_length(16) == 13

    def test_clip_sampler(self, tmp_path):
        root = self._make_frames(tmp_path)
        ds = VideoClipDataset([root], ClipSamplerConfig(
            num_frames=9, stride=2, size_hw=(8, 12)))
        assert len(ds) == 1
        clip, first, last = ds.sample(0)
        assert clip.shape == (9, 3, 8, 12)
        np.testing.assert_allclose(first, clip[0])
        np.testing.assert_allclose(last, clip[-1])
        assert clip.min() >= -1.0 and clip.max() <= 1.0

    def test_too_short_video_excluded(self, tmp_path):
        root = self._make_frames(tmp_path, n=5)
        ds = VideoClipDataset([root], ClipSamplerConfig(
            num_frames=9, stride=2, size_hw=(8, 12)))
        assert len(ds) == 0

    def test_image_folder(self, tmp_path):
        root = self._make_frames(tmp_path, n=3)
        ds = ImageFolderDataset(root, size_hw=(8, 12))
        clip = ds.sample(0)
        assert clip.shape == (1, 3, 8, 12)


class TestLPIPS:
    def test_zero_for_identical(self):
        model = LPIPS()
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), a, a)
        d = model.apply(params, a, a)
        assert float(d[0]) == pytest.approx(0.0, abs=1e-6)
        b = jnp.asarray(rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32))
        d2 = model.apply(params, a, b)
        assert abs(float(d2[0])) > 0


class TestConvert:
    def test_linear_conv(self):
        w = np.arange(6).reshape(2, 3).astype(np.float32)
        f = t2f_linear(w, np.zeros(2))
        assert f["kernel"].shape == (3, 2)
        cw = np.zeros((4, 2, 3, 3), np.float32)
        fc = t2f_conv(cw)
        assert fc["kernel"].shape == (3, 3, 2, 4)

    def test_autoencoder_conversion_runs_model(self):
        """Synthetic torch-layout state_dict loads into the flax AE and
        matches a manual forward on a sample."""
        import torch
        from langscenex_tpu.models.autoencoder import Autoencoder
        rng = np.random.default_rng(2)
        enc_dims = [512, 256, 128, 64, 32, 16, 3]
        dec_dims = [16, 32, 64, 128, 256, 512, 768]
        sd = {}
        prev = 768
        mi = 0
        for i, d in enumerate(enc_dims):
            if i > 0:
                sd[f"encoder.{mi}.weight"] = np.ones(prev, np.float32)
                sd[f"encoder.{mi}.bias"] = np.zeros(prev, np.float32)
                sd[f"encoder.{mi}.running_mean"] = np.zeros(prev, np.float32)
                sd[f"encoder.{mi}.running_var"] = np.ones(prev, np.float32)
                mi += 2  # BN, ReLU
            sd[f"encoder.{mi}.weight"] = rng.normal(
                0, 0.05, (d, prev)).astype(np.float32)
            sd[f"encoder.{mi}.bias"] = np.zeros(d, np.float32)
            mi += 1
            prev = d
        prev = 3
        mi = 0
        for i, d in enumerate(dec_dims):
            if i > 0:
                mi += 1  # ReLU
            sd[f"decoder.{mi}.weight"] = rng.normal(
                0, 0.05, (d, prev)).astype(np.float32)
            sd[f"decoder.{mi}.bias"] = np.zeros(d, np.float32)
            mi += 1
            prev = d
        variables = convert_autoencoder(sd)
        model = Autoencoder()
        x = jnp.asarray(rng.normal(size=(4, 768)).astype(np.float32))
        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, x, train=False)
        assert out.shape == (4, 768)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                                   1.0, rtol=1e-5)


    def test_cogvideox_dit_conversion(self):
        """Synthetic diffusers-layout state_dict converts into a tree that
        matches the flax init exactly (paths + shapes) and runs."""
        from langscenex_tpu.utils.convert import convert_cogvideox_dit
        from langscenex_tpu.models.cogvideox.transformer import (
            CogVideoXTransformer, TransformerConfig)
        cfg = TransformerConfig(num_layers=2, num_heads=4, head_dim=16,
                                in_channels=8, out_channels=4, patch_size=2,
                                text_embed_dim=16, time_embed_dim=32,
                                attn_dtype=jnp.float32)
        h, te, p, rng = cfg.hidden, cfg.time_embed_dim, 2, np.random.default_rng(3)

        def r(*shape):
            return rng.normal(0, 0.02, shape).astype(np.float32)

        sd = {
            "patch_embed.proj.weight": r(h, cfg.in_channels, p, p),
            "patch_embed.proj.bias": r(h),
            "patch_embed.text_proj.weight": r(h, cfg.text_embed_dim),
            "patch_embed.text_proj.bias": r(h),
            "time_embedding.linear_1.weight": r(te, h),
            "time_embedding.linear_1.bias": r(te),
            "time_embedding.linear_2.weight": r(te, te),
            "time_embedding.linear_2.bias": r(te),
            "norm_final.weight": r(h), "norm_final.bias": r(h),
            "norm_out.linear.weight": r(2 * h, te),
            "norm_out.linear.bias": r(2 * h),
            "norm_out.norm.weight": r(h), "norm_out.norm.bias": r(h),
            "proj_out.weight": r(cfg.out_channels * p * p, h),
            "proj_out.bias": r(cfg.out_channels * p * p),
        }
        for i in range(cfg.num_layers):
            b = f"transformer_blocks.{i}"
            for nm in ("norm1", "norm2"):
                sd[f"{b}.{nm}.linear.weight"] = r(6 * h, te)
                sd[f"{b}.{nm}.linear.bias"] = r(6 * h)
                sd[f"{b}.{nm}.norm.weight"] = r(h)
                sd[f"{b}.{nm}.norm.bias"] = r(h)
            for proj in ("to_q", "to_k", "to_v"):
                sd[f"{b}.attn1.{proj}.weight"] = r(h, h)
                sd[f"{b}.attn1.{proj}.bias"] = r(h)
            sd[f"{b}.attn1.to_out.0.weight"] = r(h, h)
            sd[f"{b}.attn1.to_out.0.bias"] = r(h)
            for qk in ("norm_q", "norm_k"):
                sd[f"{b}.attn1.{qk}.weight"] = r(cfg.head_dim)
                sd[f"{b}.attn1.{qk}.bias"] = r(cfg.head_dim)
            sd[f"{b}.ff.net.0.proj.weight"] = r(4 * h, h)
            sd[f"{b}.ff.net.0.proj.bias"] = r(4 * h)
            sd[f"{b}.ff.net.2.weight"] = r(h, 4 * h)
            sd[f"{b}.ff.net.2.bias"] = r(h)

        converted = convert_cogvideox_dit(sd, head_dim=cfg.head_dim)
        model = CogVideoXTransformer(cfg)
        lat = jnp.asarray(rng.normal(size=(1, 3, 8, 8, 12)).astype(np.float32))
        txt = jnp.asarray(rng.normal(size=(1, 5, 16)).astype(np.float32))
        t = jnp.array([100], jnp.int32)
        ref_params = model.init(jax.random.PRNGKey(0), lat, txt, t)

        ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_params)
        got_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape,
                                            converted)
        assert ref_shapes == got_shapes

        out = model.apply(
            jax.tree_util.tree_map(jnp.asarray, converted), lat, txt, t)
        assert out.shape == (1, 3, 4, 8, 12)
        assert np.all(np.isfinite(np.asarray(out)))

        # proj_out row permutation: torch emits (c, ph, pw) per token, ours
        # (ph, pw, c) — converted kernel must agree elementwise
        x = rng.normal(size=(h,)).astype(np.float32)
        y_torch = (sd["proj_out.weight"] @ x + sd["proj_out.bias"]
                   ).reshape(cfg.out_channels, p, p)
        kern = np.asarray(converted["params"]["proj_out"]["kernel"])
        bias = np.asarray(converted["params"]["proj_out"]["bias"])
        y_ours = (x @ kern + bias).reshape(p, p, cfg.out_channels)
        np.testing.assert_allclose(y_torch, y_ours.transpose(2, 0, 1),
                                   rtol=1e-5, atol=1e-6)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        import dataclasses
        from langscenex_tpu.scene.gaussians import (create_from_points,
                                                    DensifyStats)
        from langscenex_tpu.train.field import TrainState
        from langscenex_tpu.train.optim import (make_splat_optimizer,
                                                splat_params,
                                                make_pose_optimizer,
                                                make_app_optimizer)
        from langscenex_tpu.utils.config import OptimizationConfig
        rng = np.random.default_rng(3)
        splats = create_from_points(
            rng.uniform(-1, 1, (10, 3)).astype(np.float32),
            rng.uniform(0, 1, (10, 3)).astype(np.float32), capacity=16)
        cfg = OptimizationConfig()
        poses = jnp.zeros((2, 7)).at[:, 0].set(1.0)
        state = TrainState(
            splats=splats, poses=poses, app_ab=jnp.zeros((2, 2)),
            splat_opt=make_splat_optimizer(cfg, 1.0).init(splat_params(splats)),
            pose_opt=make_pose_optimizer(cfg).init(poses),
            app_opt=make_app_optimizer().init(jnp.zeros((2, 2))),
            stats=DensifyStats.zeros(16), step=jnp.asarray(42, jnp.int32))
        save_checkpoint(str(tmp_path), state, 42)
        assert latest_iteration(str(tmp_path)) == 42
        restored, it = restore_checkpoint(str(tmp_path), state)
        assert it == 42
        np.testing.assert_allclose(np.asarray(restored.splats.xyz),
                                   np.asarray(state.splats.xyz))
        assert int(restored.step) == 42


class TestLPIPSTorchParity:
    def test_matches_torchvision_vgg_features_and_lpips(self):
        """convert_lpips_vgg cross-validated numerically: torchvision
        VGG16 at random init -> taming-style state_dict -> flax; tap
        features and the full LPIPS value must match a torch-side
        reference computation."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn
        from langscenex_tpu.models.lpips import LPIPS, VGG16Features
        from langscenex_tpu.utils.convert import convert_lpips_vgg

        torch.manual_seed(0)
        # torchvision isn't in this image: build the VGG16 `features`
        # stack manually (identical module layout incl. indices)
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, prev = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(prev, v, 3, padding=1), tnn.ReLU()]
                prev = v
        vgg = tnn.Sequential(*layers).eval()
        rng = np.random.default_rng(0)
        sd = {f"net.features.{k}": v.numpy()
              for k, v in vgg.state_dict().items()}
        lin_ws = [rng.uniform(0, 1, (1, c, 1, 1)).astype(np.float32)
                  for c in (64, 128, 256, 512, 512)]
        for i, w in enumerate(lin_ws):
            sd[f"lin{i}.model.1.weight"] = w
        variables = convert_lpips_vgg(sd)

        a = rng.normal(0, 0.5, (1, 3, 64, 64)).astype(np.float32).clip(-1, 1)
        b = rng.normal(0, 0.5, (1, 3, 64, 64)).astype(np.float32).clip(-1, 1)

        # torch-side reference (taming LPIPS algorithm)
        shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
        scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
        tap_idx = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}   # relu layers in vgg16

        def torch_taps(x):
            h = (torch.tensor(x) - shift) / scale
            taps = {}
            for i, layer in enumerate(vgg):
                h = layer(h)
                if i in tap_idx:
                    taps[tap_idx[i]] = h
            return taps

        with torch.no_grad():
            ta, tb = torch_taps(a), torch_taps(b)
            ref = 0.0
            for i in range(5):
                na = ta[i] / ta[i].pow(2).sum(1, keepdim=True).clamp_min(
                    1e-20).sqrt()
                nb = tb[i] / tb[i].pow(2).sum(1, keepdim=True).clamp_min(
                    1e-20).sqrt()
                d = (na - nb) ** 2
                w = torch.tensor(lin_ws[i])
                ref = ref + (d * w).sum(1, keepdim=True).mean()
            ref = float(ref)

        # feature-level parity at the last tap
        feats = VGG16Features().apply(
            {"params": jax.tree_util.tree_map(
                jnp.asarray, variables["params"]["vgg"])}, jnp.asarray(a))
        np.testing.assert_allclose(
            np.asarray(feats[4]).transpose(0, 3, 1, 2),
            ta[4].numpy(), atol=1e-3, rtol=1e-3)

        got = float(LPIPS().apply(
            {"params": jax.tree_util.tree_map(jnp.asarray,
                                              variables["params"])},
            jnp.asarray(a), jnp.asarray(b))[0])
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestAEConverterTorchParity:
    def test_matches_torch_sequential(self):
        """convert_autoencoder cross-validated against a torch module
        with the reference's exact layout (BN+ReLU before every hidden
        Linear in the encoder; ReLU-MLP decoder; L2 norms)."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn
        import torch.nn.functional as tF
        from langscenex_tpu.models.autoencoder import Autoencoder

        torch.manual_seed(3)
        enc_dims = [512, 256, 128, 64, 32, 16, 3]
        dec_dims = [16, 32, 64, 128, 256, 512, 768]
        enc_layers, prev = [], 768
        for i, d in enumerate(enc_dims):
            if i > 0:
                enc_layers += [tnn.BatchNorm1d(prev), tnn.ReLU()]
            enc_layers.append(tnn.Linear(prev, d))
            prev = d
        dec_layers, prev = [], 3
        for i, d in enumerate(dec_dims):
            if i > 0:
                dec_layers.append(tnn.ReLU())
            dec_layers.append(tnn.Linear(prev, d))
            prev = d
        encoder = tnn.Sequential(*enc_layers).eval()
        decoder = tnn.Sequential(*dec_layers).eval()
        # non-trivial running stats
        for m in encoder:
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

        sd = {}
        for k, v in encoder.state_dict().items():
            if not k.endswith("num_batches_tracked"):
                sd[f"encoder.{k}"] = v.numpy()
        for k, v in decoder.state_dict().items():
            sd[f"decoder.{k}"] = v.numpy()
        variables = convert_autoencoder(sd)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(8, 768)).astype(np.float32)
        with torch.no_grad():
            z = encoder(torch.tensor(x))
            z = z / z.norm(dim=-1, keepdim=True).clamp_min(1e-6)
            y = decoder(z)
            ref = (y / y.norm(dim=-1, keepdim=True).clamp_min(1e-6)).numpy()
        out = Autoencoder().apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5,
                                   rtol=2e-5)
