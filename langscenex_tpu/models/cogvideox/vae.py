"""CogVideoX 3D causal VAE in flax (encoder + decoder).

Parity target: the diffusers AutoencoderKLCogVideoX the reference loads
(cogvideox_interpolation/pipeline.py:9-13,135-140): 8x spatial / 4x
temporal compression, 16 latent channels, causal 3D convolutions (the
first frame is replicate-padded into the past so frame t never sees t+1),
GroupNorm(32)+SiLU ResNet blocks, channel ladder [128, 256, 256, 512]
(layers_per_block=3 encoder / 4 decoder), attention-free mid blocks, and
— crucially for weights — the DECODER conditions every norm on the latent
z through CogVideoXSpatialNorm3D (GroupNorm * conv_y(z) + conv_b(z)).
Temporal down/upsampling happens at the first two blocks with the odd
frame-count convention (4k+1 frames): the first frame is held out, the
rest average-pool / nearest-upsample in pairs.

1:1 weight-mappable via utils/convert.convert_cogvideox_vae (validated in
tests/test_vae.py against a torch mirror of the diffusers layout).

TPU notes: convs run in NTHWC layout (channels last -> lanes); the causal
temporal pad is an explicit concat so the conv stays VALID in time and XLA
fuses the pad. Tiled decode (the reference's enable_tiling,
video_inference.py:29-30) is spatial_tile_decode below.
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
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    temporal_compression: int = 4     # 2 temporal stages (log2)
    norm_groups: int = 32
    scaling_factor: float = 1.15258426

    @property
    def temporal_levels(self) -> int:
        return {4: 2, 2: 1, 1: 0}[self.temporal_compression]


class CausalConv3d(nn.Module):
    """CogVideoXCausalConv3d: replicate the first frame (kt-1)x into the
    past, zero-pad space, VALID temporal conv. Input NTHWC. Param path
    <name>/conv mirrors the torch ``.conv`` wrapper."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        if kt > 1:
            first = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([first, x], axis=1)
        pad = [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
        return nn.Conv(self.features, self.kernel, strides=self.stride,
                       padding=pad, name="conv")(x)


def _nearest_resize_time(z, t_out):
    """Nearest temporal resize [B,T,H,W,C] -> [B,t_out,H,W,C] (torch
    F.interpolate 5D nearest over the time axis)."""
    T = z.shape[1]
    idx = (jnp.arange(t_out) * T) // t_out
    return z[:, idx]


def _nearest_resize_hw(z, hw):
    H, W = hw
    h_in, w_in = z.shape[2], z.shape[3]
    yi = (jnp.arange(H) * h_in) // H
    xi = (jnp.arange(W) * w_in) // W
    return z[:, :, yi][:, :, :, xi]


class SpatialNorm3D(nn.Module):
    """CogVideoXSpatialNorm3D: GroupNorm(f) * conv_y(zq) + conv_b(zq),
    where zq is the latent nearest-resized to f's (T,H,W) with the
    odd-frame first/rest split."""
    features: int
    groups: int

    @nn.compact
    def __call__(self, f, zq):
        Tf = f.shape[1]
        if Tf > 1 and Tf % 2 == 1:
            z_first = _nearest_resize_hw(
                _nearest_resize_time(zq[:, :1], 1), f.shape[2:4])
            z_rest = _nearest_resize_hw(
                _nearest_resize_time(zq[:, 1:], Tf - 1), f.shape[2:4])
            zq = jnp.concatenate([z_first, z_rest], axis=1)
        else:
            zq = _nearest_resize_hw(_nearest_resize_time(zq, Tf),
                                    f.shape[2:4])
        normed = nn.GroupNorm(num_groups=min(self.groups, self.features),
                              epsilon=1e-6, name="norm_layer")(f)
        y = CausalConv3d(self.features, (1, 1, 1), name="conv_y")(zq)
        b = CausalConv3d(self.features, (1, 1, 1), name="conv_b")(zq)
        return normed * y + b


class ResBlock3d(nn.Module):
    """CogVideoXResnetBlock3D. With ``spatial_norm`` the norms become
    z-conditioned SpatialNorm3D (decoder); otherwise plain GroupNorm."""
    features: int
    groups: int = 32
    spatial_norm: bool = False

    @nn.compact
    def __call__(self, x, zq=None):
        def norm(name, h):
            if self.spatial_norm:
                return SpatialNorm3D(h.shape[-1], self.groups, name=name)(
                    h, zq)
            return nn.GroupNorm(num_groups=min(self.groups, h.shape[-1]),
                                epsilon=1e-6, name=name)(h)

        h = nn.silu(norm("norm1", x))
        h = CausalConv3d(self.features, name="conv1")(h)
        h = nn.silu(norm("norm2", h))
        h = CausalConv3d(self.features, name="conv2")(h)
        if x.shape[-1] != self.features:
            # CogVideoXSafeConv3d 1x1x1 (plain conv, no .conv wrapper)
            x = nn.Conv(self.features, (1, 1, 1), name="conv_shortcut")(x)
        return x + h


def _avg_pool_time(x):
    """CogVideoXDownsample3D temporal part: odd T keeps frame 0 and
    avg-pools the rest in pairs; even T avg-pools everything."""
    B, T, H, W, C = x.shape
    if T % 2 == 1:
        first = x[:, :1]
        rest = x[:, 1:]
        if rest.shape[1] > 0:
            rest = rest.reshape(B, (T - 1) // 2, 2, H, W, C).mean(axis=2)
        return jnp.concatenate([first, rest], axis=1)
    return x.reshape(B, T // 2, 2, H, W, C).mean(axis=2)


class Downsample3d(nn.Module):
    """CogVideoXDownsample3D: optional temporal avg-pool, then per-frame
    Conv2d stride 2 with (right, bottom) zero pad."""
    features: int
    compress_time: bool

    @nn.compact
    def __call__(self, x):
        if self.compress_time:
            x = _avg_pool_time(x)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.features, (1, 3, 3), strides=(1, 2, 2),
                       padding='VALID', name="conv")(x)


class Upsample3d(nn.Module):
    """CogVideoXUpsample3D: nearest 2x upsampling — odd T holds the first
    frame out of the temporal doubling — then per-frame Conv2d 3x3."""
    features: int
    compress_time: bool

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        if self.compress_time:
            if T > 1 and T % 2 == 1:
                first = jax.image.resize(
                    x[:, :1], (B, 1, H * 2, W * 2, C), method='nearest')
                rest = jax.image.resize(
                    x[:, 1:], (B, (T - 1) * 2, H * 2, W * 2, C),
                    method='nearest')
                x = jnp.concatenate([first, rest], axis=1)
            elif T > 1:
                x = jax.image.resize(x, (B, T * 2, H * 2, W * 2, C),
                                     method='nearest')
            else:
                x = jax.image.resize(x, (B, 1, H * 2, W * 2, C),
                                     method='nearest')
        else:
            x = jax.image.resize(x, (B, T, H * 2, W * 2, C),
                                 method='nearest')
        return nn.Conv(self.features, (1, 3, 3), padding='SAME',
                       name="conv")(x)


class Encoder(nn.Module):
    """CogVideoXEncoder3D: down_blocks (resnets + downsampler; time
    compression at the first ``temporal_levels`` blocks), 2-resnet mid
    block, GroupNorm + SiLU + conv_out to 2*latent moments."""
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        chs = cfg.block_out_channels
        h = CausalConv3d(chs[0], name="conv_in")(x)
        for i, ch in enumerate(chs):
            for j in range(cfg.layers_per_block):
                h = ResBlock3d(ch, cfg.norm_groups,
                               name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(chs) - 1:
                h = Downsample3d(ch, i < cfg.temporal_levels,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
        h = ResBlock3d(chs[-1], cfg.norm_groups, name="mid_resnets_0")(h)
        h = ResBlock3d(chs[-1], cfg.norm_groups, name="mid_resnets_1")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-6,
                         name="norm_out")(h)
        h = nn.silu(h)
        return CausalConv3d(2 * cfg.latent_channels, name="conv_out")(h)


class Decoder(nn.Module):
    """CogVideoXDecoder3D: conv_in, spatial-norm mid block, up_blocks
    (layers_per_block+1 resnets + upsampler; time expansion at the first
    ``temporal_levels`` blocks), SpatialNorm + SiLU + conv_out. Every norm
    is conditioned on the input latent z."""
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        chs = list(reversed(cfg.block_out_channels))
        h = CausalConv3d(chs[0], name="conv_in")(z)
        h = ResBlock3d(chs[0], cfg.norm_groups, spatial_norm=True,
                       name="mid_resnets_0")(h, z)
        h = ResBlock3d(chs[0], cfg.norm_groups, spatial_norm=True,
                       name="mid_resnets_1")(h, z)
        for i, ch in enumerate(chs):
            for j in range(cfg.layers_per_block + 1):
                h = ResBlock3d(ch, cfg.norm_groups, spatial_norm=True,
                               name=f"up_blocks_{i}_resnets_{j}")(h, z)
            if i < len(chs) - 1:
                h = Upsample3d(ch, i < cfg.temporal_levels,
                               name=f"up_blocks_{i}_upsamplers_0")(h)
        h = SpatialNorm3D(chs[-1], cfg.norm_groups, name="norm_out")(h, z)
        h = nn.silu(h)
        return CausalConv3d(cfg.out_channels, name="conv_out")(h)


class AutoencoderKL3D(nn.Module):
    """Full VAE. Inputs/outputs use the pipeline's [B, T, C, H, W] layout;
    internally NTHWC. No quant convs (use_quant_conv=False in the
    CogVideoX config)."""
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
