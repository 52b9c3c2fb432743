"""CogVideoX 3D causal VAE in flax (encoder + decoder).

Parity target: the AutoencoderKLCogVideoX the reference loads
(cogvideox_interpolation/pipeline.py:9-13,135-140): 8x spatial / 4x
temporal compression, 16 latent channels, causal 3D convolutions (pad only
on the past side of time so frame t never sees t+1), GroupNorm(32)+SiLU
ResNet blocks, channel ladder [128, 256, 256, 512], temporal downsampling
on the last two encoder stages (and mirrored upsampling in the decoder),
mid blocks with no attention (CogVideoX VAE is attention-free).

TPU notes: convs run as lax.conv_general_dilated in NDHWC layout (channels
last -> lanes); the causal temporal pad is an explicit concat so the conv
itself stays VALID in time and XLA fuses the pad. Tiled decode (the
reference's enable_tiling, video_inference.py:29-30) is spatial_tile_decode
below.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    temporal_compression: int = 4     # 2 temporal downsamples
    norm_groups: int = 32
    scaling_factor: float = 0.7


class CausalConv3d(nn.Module):
    """3D conv with causal temporal padding (past-only) and SAME spatial
    padding. Input NTHWC."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        # causal: replicate-pad the first frame backwards in time
        # (CogVideoXCausalConv3d uses replicate padding of 2*(kt//2))
        if kt > 1:
            tpad = 2 * (kt // 2) // 1
            first = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([first, x], axis=1)
        pad = [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
        return nn.Conv(self.features, self.kernel, strides=self.stride,
                       padding=[(0, 0)] + pad[1:] if kt > 1 else pad,
                       name="conv")(x)


class ResBlock3d(nn.Module):
    features: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]),
                         epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(self.features, name="conv1")(h)
        h = nn.GroupNorm(num_groups=min(self.groups, self.features),
                         epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = CausalConv3d(self.features, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1), name="skip")(x)
        return x + h


class Downsample3d(nn.Module):
    features: int
    temporal: bool

    @nn.compact
    def __call__(self, x):
        # spatial stride-2 (pad right/bottom like diffusers downsample2D)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        x = nn.Conv(self.features, (1, 3, 3), strides=(1, 2, 2),
                    padding='VALID', name="conv")(x)
        if self.temporal:
            # causal temporal stride-2: keep frame 0, then every 2nd
            x = x[:, ::2]
        return x


class Upsample3d(nn.Module):
    features: int
    temporal: bool

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        x = jax.image.resize(x, (B, T, H * 2, W * 2, C), method='nearest')
        if self.temporal:
            x = jnp.repeat(x, 2, axis=1)
        return nn.Conv(self.features, (1, 3, 3), padding='SAME',
                       name="conv")(x)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        chs = cfg.block_out_channels
        n_temporal = {4: 2, 2: 1, 1: 0}[cfg.temporal_compression]
        h = CausalConv3d(chs[0], name="conv_in")(x)
        for i, ch in enumerate(chs):
            for j in range(cfg.layers_per_block):
                h = ResBlock3d(ch, cfg.norm_groups, name=f"down_{i}_res_{j}")(h)
            if i < len(chs) - 1:
                temporal = i >= len(chs) - 1 - n_temporal
                h = Downsample3d(chs[i + 1], temporal, name=f"down_{i}_ds")(h)
        h = ResBlock3d(chs[-1], cfg.norm_groups, name="mid_res_0")(h)
        h = ResBlock3d(chs[-1], cfg.norm_groups, name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-6,
                         name="norm_out")(h)
        h = nn.silu(h)
        return CausalConv3d(2 * cfg.latent_channels, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        chs = list(reversed(cfg.block_out_channels))
        n_temporal = {4: 2, 2: 1, 1: 0}[cfg.temporal_compression]
        h = CausalConv3d(chs[0], name="conv_in")(z)
        h = ResBlock3d(chs[0], cfg.norm_groups, name="mid_res_0")(h)
        h = ResBlock3d(chs[0], cfg.norm_groups, name="mid_res_1")(h)
        for i, ch in enumerate(chs):
            for j in range(cfg.layers_per_block + 1):
                h = ResBlock3d(ch, cfg.norm_groups, name=f"up_{i}_res_{j}")(h)
            if i < len(chs) - 1:
                temporal = i < n_temporal
                h = Upsample3d(chs[i + 1], temporal, name=f"up_{i}_us")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-6,
                         name="norm_out")(h)
        h = nn.silu(h)
        return CausalConv3d(cfg.in_channels, name="conv_out")(h)


class AutoencoderKL3D(nn.Module):
    """Full VAE. Inputs/outputs use the pipeline's [B, T, C, H, W] layout;
    internally NTHWC."""
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode(self, video):
        """[B,T,3,H,W] -> (mean, logvar) each [B,T',16,H/8,W/8]."""
        x = video.transpose(0, 1, 3, 4, 2)
        moments = self.encoder(x)
        moments = moments.transpose(0, 1, 4, 2, 3)
        return jnp.split(moments, 2, axis=2)

    def decode(self, latents):
        """[B,T',16,H',W'] -> [B,T,3,8H',8W']."""
        z = latents.transpose(0, 1, 3, 4, 2)
        out = self.decoder(z)
        return out.transpose(0, 1, 4, 2, 3)

    def __call__(self, video, key=None):
        mean, logvar = self.encode(video)
        if key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape)
        else:
            z = mean
        return self.decode(z), mean, logvar


def spatial_tile_decode(apply_fn, latents, tile: int = 32, overlap: int = 8):
    """Memory-bounded tiled decode (enable_tiling parity,
    video_inference.py:29-30): decode overlapping spatial latent tiles and
    linearly blend the seams."""
    B, T, C, H, W = latents.shape
    sf = 8
    out = None
    step = tile - overlap
    ys = list(range(0, max(H - overlap, 1), step))
    xs = list(range(0, max(W - overlap, 1), step))
    for yi in ys:
        for xi in xs:
            z = latents[:, :, :, yi:yi + tile, xi:xi + tile]
            dec = apply_fn(z)
            if out is None:
                Tout = dec.shape[1]
                out = jnp.zeros((B, Tout, dec.shape[2], H * sf, W * sf))
                wsum = jnp.zeros((1, 1, 1, H * sf, W * sf))
            hh, ww = dec.shape[-2], dec.shape[-1]
            wy = _blend_profile(hh, overlap * sf)
            wx = _blend_profile(ww, overlap * sf)
            wmap = wy[:, None] * wx[None, :]
            out = out.at[:, :, :, yi * sf:yi * sf + hh,
                         xi * sf:xi * sf + ww].add(dec * wmap)
            wsum = wsum.at[:, :, :, yi * sf:yi * sf + hh,
                           xi * sf:xi * sf + ww].add(wmap)
    return out / jnp.maximum(wsum, 1e-8)


def _blend_profile(n: int, ramp: int) -> jnp.ndarray:
    w = jnp.ones((n,))
    r = jnp.linspace(0, 1, ramp) if ramp > 0 else jnp.ones((0,))
    w = w.at[:ramp].set(jnp.minimum(w[:ramp], r))
    w = w.at[-ramp:].set(jnp.minimum(w[-ramp:], r[::-1]))
    return w
