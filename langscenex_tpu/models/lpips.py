"""LPIPS perceptual metric (VGG16 features + learned linear heads), flax.

Parity target: cogvideox_interpolation/lpips.py:47-160 (taming-style
LPIPS: imagenet-normalized input, VGG16 relu1_2..relu5_3 features,
channel-unit-normalize, learned 1x1 linear weights, spatial mean, sum over
layers). Weights port from the published vgg_lpips checkpoint via
utils/convert.py; without weights the metric still runs (random init) for
shape/pipeline tests.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

_SHIFT = jnp.array([-.030, -.088, -.188])
_SCALE = jnp.array([.458, .448, .450])

VGG_CFG = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
           512, 512, 512, 'M', 512, 512, 512)
# indices (into conv outputs) after which features are tapped: relu1_2,
# relu2_2, relu3_3, relu4_3, relu5_3
TAPS = (1, 3, 6, 9, 12)
TAP_CHANNELS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x [B,3,H,W] in [-1,1] -> list of 5 tap features (NHWC)."""
        h = x.transpose(0, 2, 3, 1)
        h = (h - _SHIFT) / _SCALE
        taps = []
        conv_i = 0
        for v in VGG_CFG:
            if v == 'M':
                h = nn.max_pool(h, (2, 2), (2, 2))
            else:
                h = nn.Conv(v, (3, 3), padding='SAME',
                            name=f"conv_{conv_i}")(h)
                h = nn.relu(h)
                if conv_i in TAPS:
                    taps.append(h)
                conv_i += 1
        return taps


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps * eps))
    return x / n


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """[B,3,H,W] pairs in [-1,1] -> [B] perceptual distances."""
        vgg = VGG16Features(name="vgg")
        fa = vgg(a)
        fb = vgg(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            d = (_unit_normalize(xa) - _unit_normalize(xb)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{i}")(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total
