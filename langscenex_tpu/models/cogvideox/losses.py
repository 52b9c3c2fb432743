"""VAE / GAN training losses for the 3D-causal-VAE fine-tune.

Parity targets: cogvideox_interpolation/losses.py — VAELoss:59-129
(LPIPS-weighted reconstruction NLL + KL with per-sample logvar),
AdversarialLoss:138-192 (hinge / non-saturating generator loss with
adaptive weight from gradient-norm ratio), DiscriminatorLoss:209-279
(hinge/vanilla + LeCam regularization + R1 gradient penalty),
LeCamEMA:195 (EMA of real/fake discriminator means).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------- VAE

def kl_divergence(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0,1)) summed per sample, mean over batch."""
    kl = 0.5 * (mean ** 2 + jnp.exp(logvar) - 1.0 - logvar)
    return jnp.mean(jnp.sum(kl.reshape(kl.shape[0], -1), -1))


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    kl_weight: float = 1e-6
    perceptual_weight: float = 1.0
    logvar_init: float = 0.0


def vae_loss(recon: jnp.ndarray, target: jnp.ndarray, mean: jnp.ndarray,
             logvar_q: jnp.ndarray, out_logvar: jnp.ndarray,
             lpips_fn: Optional[Callable] = None,
             cfg: VAELossConfig = VAELossConfig()):
    """losses.VAELoss:59-129: nll = (|x-x'| + w_p * lpips) / exp(logvar)
    + logvar, plus KL. ``out_logvar`` is the learned scalar output
    log-variance parameter."""
    rec = jnp.abs(recon - target)
    if lpips_fn is not None and cfg.perceptual_weight > 0:
        rec = rec + cfg.perceptual_weight * lpips_fn(recon, target)
    nll = rec / jnp.exp(out_logvar) + out_logvar
    nll = jnp.mean(jnp.sum(nll.reshape(nll.shape[0], -1), -1))
    kl = kl_divergence(mean, logvar_q)
    total = nll + cfg.kl_weight * kl
    return total, {"nll": nll, "kl": kl}


# ----------------------------------------------------------------- GAN

class LeCamEMA(NamedTuple):
    """EMA trackers of D(real)/D(fake) means (losses.LeCamEMA:195)."""
    real: jnp.ndarray
    fake: jnp.ndarray
    decay: float = 0.999

    def update(self, d_real: jnp.ndarray, d_fake: jnp.ndarray) -> "LeCamEMA":
        d = self.decay
        return LeCamEMA(real=d * self.real + (1 - d) * jnp.mean(d_real),
                        fake=d * self.fake + (1 - d) * jnp.mean(d_fake),
                        decay=d)


def lecam_reg(d_real: jnp.ndarray, d_fake: jnp.ndarray,
              ema: LeCamEMA) -> jnp.ndarray:
    """LeCam regularizer: pull D outputs toward the opposing EMA."""
    return (jnp.mean(jax.nn.relu(d_real - ema.fake) ** 2)
            + jnp.mean(jax.nn.relu(ema.real - d_fake) ** 2))


def discriminator_loss(d_real: jnp.ndarray, d_fake: jnp.ndarray,
                       kind: str = "hinge") -> jnp.ndarray:
    """losses.DiscriminatorLoss:209-279."""
    if kind == "hinge":
        return (jnp.mean(jax.nn.relu(1.0 - d_real))
                + jnp.mean(jax.nn.relu(1.0 + d_fake)))
    # vanilla (non-saturating BCE)
    return (jnp.mean(jax.nn.softplus(-d_real))
            + jnp.mean(jax.nn.softplus(d_fake)))


def generator_loss(d_fake: jnp.ndarray, kind: str = "hinge") -> jnp.ndarray:
    if kind == "hinge":
        return -jnp.mean(d_fake)
    return jnp.mean(jax.nn.softplus(-d_fake))


def r1_gradient_penalty(disc_fn: Callable, real: jnp.ndarray) -> jnp.ndarray:
    """R1 penalty: E[||grad_x D(x)||^2] on real samples."""
    def scalar_d(x):
        # sum (not mean) so each sample's gradient is undiluted by batch
        return jnp.sum(disc_fn(x))
    g = jax.grad(scalar_d)(real)
    return jnp.sum(g ** 2) / real.shape[0]


def adaptive_generator_weight(nll_grad_norm: jnp.ndarray,
                              g_grad_norm: jnp.ndarray,
                              max_weight: float = 1e4) -> jnp.ndarray:
    """Adaptive adversarial weight = ||grad nll|| / ||grad g_loss||
    (losses.AdversarialLoss calculate_adaptive_weight semantics)."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, max_weight))
