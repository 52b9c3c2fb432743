"""3D-causal-VAE fine-tuning trainer (GAN-augmented).

The reference ships datasets/losses/configs for this stage but not the
train script itself (SURVEY.md §2.2 note); this trainer binds
models/cogvideox/vae.py to models/cogvideox/losses.py with the reference's
loss structure: reconstruction NLL (optionally LPIPS-weighted) + KL +
adversarial with LeCam regularization, alternating G/D updates.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.cogvideox.losses import (LeCamEMA, VAELossConfig,
                                       discriminator_loss, generator_loss,
                                       lecam_reg, vae_loss)
from ..models.cogvideox.vae import AutoencoderKL3D, VAEConfig


class Discriminator3D(nn.Module):
    """PatchGAN-style 3D discriminator (the adversarial stage's D)."""
    base: int = 32

    @nn.compact
    def __call__(self, video):
        """[B,T,3,H,W] -> [B, t', h', w'] logits."""
        x = video.transpose(0, 1, 3, 4, 2)
        for i, mult in enumerate((1, 2, 4)):
            x = nn.Conv(self.base * mult, (3, 4, 4), strides=(1, 2, 2),
                        name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (3, 3, 3), padding='SAME', name="head")(x)
        return x[..., 0]


@dataclasses.dataclass
class VAETrainConfig:
    lr: float = 1e-4
    disc_lr: float = 1e-4
    kl_weight: float = 1e-6
    disc_weight: float = 0.5
    lecam_weight: float = 0.1
    disc_start_step: int = 0
    gan_kind: str = "hinge"


class VAETrainState(NamedTuple):
    vae_params: dict
    disc_params: dict
    vae_opt: optax.OptState
    disc_opt: optax.OptState
    logvar: jnp.ndarray
    lecam: LeCamEMA
    step: jnp.ndarray


class VAETrainer:
    def __init__(self, vae_cfg: VAEConfig = VAEConfig(),
                 cfg: VAETrainConfig = VAETrainConfig(),
                 sample_shape=(1, 5, 3, 64, 64), seed: int = 0,
                 lpips_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.vae = AutoencoderKL3D(vae_cfg)
        self.disc = Discriminator3D()
        key = jax.random.PRNGKey(seed)
        x0 = jnp.zeros(sample_shape)
        vae_params = self.vae.init(key, x0)
        disc_params = self.disc.init(key, x0)
        self.vae_tx = optax.adam(cfg.lr, b1=0.5, b2=0.9)
        self.disc_tx = optax.adam(cfg.disc_lr, b1=0.5, b2=0.9)
        self.state = VAETrainState(
            vae_params=vae_params, disc_params=disc_params,
            vae_opt=self.vae_tx.init(vae_params),
            disc_opt=self.disc_tx.init(disc_params),
            logvar=jnp.zeros(()),
            lecam=LeCamEMA(jnp.zeros(()), jnp.zeros(())),
            step=jnp.zeros((), jnp.int32))
        self.lpips_fn = lpips_fn
        self._step = jax.jit(self._train_step)

    def _train_step(self, state: VAETrainState, batch: jnp.ndarray,
                    key: jax.Array):
        cfg = self.cfg
        use_gan = state.step >= cfg.disc_start_step

        def g_loss(vae_params, logvar):
            recon, mean, q_logvar = self.vae.apply(vae_params, batch, key)
            recon = recon[:, :batch.shape[1]]
            total, parts = vae_loss(
                recon, batch, mean, q_logvar, logvar,
                lpips_fn=self.lpips_fn,
                cfg=VAELossConfig(kl_weight=cfg.kl_weight))
            d_fake = self.disc.apply(state.disc_params, recon)
            gl = generator_loss(d_fake, cfg.gan_kind)
            total = total + jnp.where(use_gan, cfg.disc_weight * gl, 0.0)
            return total, (parts, recon, gl)

        (gval, (parts, recon, gl)), (g_vae, g_logvar) = jax.value_and_grad(
            g_loss, argnums=(0, 1), has_aux=True)(
            state.vae_params, state.logvar)
        vu, vae_opt = self.vae_tx.update(g_vae, state.vae_opt,
                                         state.vae_params)
        vae_params = optax.apply_updates(state.vae_params, vu)
        logvar = state.logvar - cfg.lr * g_logvar

        def d_loss(disc_params):
            d_real = self.disc.apply(disc_params, batch)
            d_fake = self.disc.apply(disc_params,
                                     jax.lax.stop_gradient(recon))
            dl = discriminator_loss(d_real, d_fake, cfg.gan_kind)
            dl = dl + cfg.lecam_weight * lecam_reg(d_real, d_fake,
                                                   state.lecam)
            return dl, (d_real, d_fake)

        (dval, (d_real, d_fake)), g_disc = jax.value_and_grad(
            d_loss, has_aux=True)(state.disc_params)
        du, disc_opt = self.disc_tx.update(g_disc, state.disc_opt,
                                           state.disc_params)
        disc_params = jax.tree_util.tree_map(
            lambda p, u: jnp.where(use_gan, p + u, p),
            state.disc_params, du)

        new_state = VAETrainState(
            vae_params=vae_params, disc_params=disc_params,
            vae_opt=vae_opt, disc_opt=disc_opt, logvar=logvar,
            lecam=state.lecam.update(d_real, d_fake),
            step=state.step + 1)
        metrics = {"g_total": gval, "nll": parts["nll"], "kl": parts["kl"],
                   "g_adv": gl, "d_loss": dval}
        return new_state, metrics

    def train_step(self, batch: np.ndarray, key) -> dict:
        self.state, metrics = self._step(self.state, jnp.asarray(batch), key)
        return {k: float(v) for k, v in metrics.items()}
