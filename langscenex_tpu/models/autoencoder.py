"""Per-scene language feature autoencoder (768-d CLIP/OpenSeg -> 3-d).

Parity target: field_construction/auto_encoder.py:28-73 — encoder MLP
768 -> [512, 256, 128, 64, 32, 16] -> 3 with BatchNorm1d+ReLU *before*
every hidden Linear (the reference appends [BN(prev), ReLU, Linear]), and a
plain ReLU-MLP decoder 3 -> [16, 32, 64, 128, 256, 512, 768]; both latent
and output are L2-normalized.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

ENCODER_DIMS = (512, 256, 128, 64, 32, 16, 3)
DECODER_DIMS = (16, 32, 64, 128, 256, 512, 768)


def _l2norm(x, eps=1e-12):
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps))


class Encoder(nn.Module):
    dims: Sequence[int] = ENCODER_DIMS

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, d in enumerate(self.dims):
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5)(x)
                x = nn.relu(x)
            x = nn.Dense(d)(x)
        return _l2norm(x)


class Decoder(nn.Module):
    dims: Sequence[int] = DECODER_DIMS

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            if i > 0:
                x = nn.relu(x)
            x = nn.Dense(d)(x)
        return _l2norm(x)


class Autoencoder(nn.Module):
    encoder_dims: Sequence[int] = ENCODER_DIMS
    decoder_dims: Sequence[int] = DECODER_DIMS

    def setup(self):
        self.encoder = Encoder(self.encoder_dims)
        self.decoder = Decoder(self.decoder_dims)

    def __call__(self, x, train: bool = False):
        return self.decoder(self.encoder(x, train=train))

    def encode(self, x, train: bool = False):
        return self.encoder(x, train=train)

    def decode(self, z):
        return self.decoder(z)
