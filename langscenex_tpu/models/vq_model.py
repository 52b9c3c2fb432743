"""VQ autoencoder matching diffusers' ``VQModel`` at the reference's
LSeg-compressor configuration (field_construction/preprocessor.py:115-127:
in/out 512, latent 4, blocks [256, 64, 16], 1 layer/block, GroupNorm(2)
in the encoder, SpatialNorm in the decoder, 1024 VQ codes).

The reference uses it as the LSeg-path semantic compressor: per-image
512-d LSeg features -> ``encode().latents`` (the CONTINUOUS post-
quant_conv latents, pre-codebook — diffusers semantics) -> saved as
``lang_features_dim4/*_f.npy`` (preprocessor.py:250-255). decode() (with
the codebook lookup) is implemented for completeness/round-trips.

TPU-first notes: NHWC layout throughout (flax conv native), GroupNorm/
attention in f32 for parity, everything jit-friendly static shapes.
utils/convert.convert_vq_model maps the diffusers state_dict 1:1.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VQConfig:
    in_channels: int = 512
    out_channels: int = 512
    latent_channels: int = 4
    # diffusers' VQModel hard-codes 32 GroupNorm groups, but this
    # config's 16/64-channel decoder stages cannot satisfy 32 groups
    # (the upstream branch cannot even construct at the LSeg
    # compressor's channel plan) — 2 divides every stage width here.
    # A converted checkpoint with a different group count would fail
    # shape verification loudly, not silently.
    norm_num_groups: int = 2
    block_out_channels: Tuple[int, ...] = (256, 64, 16)
    layers_per_block: int = 1
    num_vq_embeddings: int = 1024
    # vq_embed_dim defaults to latent_channels in diffusers
    norm_type: str = "spatial"        # decoder norm; encoder is group


class ResnetBlock(nn.Module):
    """diffusers ResnetBlock2D (GN -> silu -> conv) x2 + shortcut.
    ``spatial``: use SpatialNorm(zq) instead of GroupNorm (decoder)."""
    out_ch: int
    groups: int
    spatial: bool = False

    @nn.compact
    def __call__(self, x, zq=None):
        in_ch = x.shape[-1]

        def norm(name, h):
            if self.spatial:
                return SpatialNorm(self.groups, name=name)(h, zq)
            return nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                                name=name)(h)

        h = nn.silu(norm("norm1", x))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        h = nn.silu(norm("norm2", h))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class SpatialNorm(nn.Module):
    """diffusers SpatialNorm: GN(f) * conv_y(zq) + conv_b(zq), with zq
    nearest-resized to f's spatial dims (used by the VQ decoder)."""
    groups: int

    @nn.compact
    def __call__(self, f, zq):
        H, W = f.shape[1], f.shape[2]
        zq = jax.image.resize(zq, (zq.shape[0], H, W, zq.shape[-1]),
                              method="nearest")
        n = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="norm_layer")(f)
        y = nn.Conv(f.shape[-1], (1, 1), name="conv_y")(zq)
        b = nn.Conv(f.shape[-1], (1, 1), name="conv_b")(zq)
        return n * y + b


class AttnBlock(nn.Module):
    """diffusers Attention in the VAE mid-block: single-head linear
    q/k/v over the flattened spatial grid."""
    groups: int
    spatial: bool = False

    @nn.compact
    def __call__(self, x, zq=None):
        B, H, W, C = x.shape
        if self.spatial:
            h = SpatialNorm(self.groups, name="spatial_norm")(x, zq)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                             name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q")(h)
        k = nn.Dense(C, name="to_k")(h)
        v = nn.Dense(C, name="to_v")(h)
        att = jax.nn.softmax(
            (q @ k.transpose(0, 2, 1)) / jnp.sqrt(C).astype(x.dtype), -1)
        o = att @ v
        o = nn.Dense(C, name="to_out")(o).reshape(B, H, W, C)
        return x + o


class Downsample(nn.Module):
    """stride-2 conv with diffusers' asymmetric (0,1) pad."""
    ch: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.ch, (3, 3), strides=2, padding=0,
                       name="conv")(x)


class Upsample(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(self.ch, (3, 3), padding=1, name="conv")(x)


class Encoder(nn.Module):
    cfg: VQConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(x)
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, g, name=f"down_{i}_res_{j}")(h)
            if i < n_blocks - 1:
                h = Downsample(ch, name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(ch, g, name="mid_res_0")(h)
        h = AttnBlock(g, name="mid_attn")(h)
        h = ResnetBlock(ch, g, name="mid_res_1")(h)
        h = nn.silu(nn.GroupNorm(num_groups=g, epsilon=1e-6,
                                 name="conv_norm_out")(h))
        return nn.Conv(cfg.latent_channels, (3, 3), padding=1,
                       name="conv_out")(h)


class Decoder(nn.Module):
    """Mirror decoder; with norm_type='spatial' every norm is
    SpatialNorm conditioned on the (pre-post_quant_conv) latents zq.
    diffusers uses layers_per_block + 1 resnets per up block."""
    cfg: VQConfig

    @nn.compact
    def __call__(self, z, zq):
        cfg = self.cfg
        g = cfg.norm_num_groups
        sp = cfg.norm_type == "spatial"
        rev = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, name="conv_in")(z)
        h = ResnetBlock(rev[0], g, spatial=sp, name="mid_res_0")(h, zq)
        h = AttnBlock(g, spatial=sp, name="mid_attn")(h, zq)
        h = ResnetBlock(rev[0], g, spatial=sp, name="mid_res_1")(h, zq)
        n_blocks = len(rev)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, g, spatial=sp,
                                name=f"up_{i}_res_{j}")(h, zq)
            if i < n_blocks - 1:
                h = Upsample(ch, name=f"up_{i}_upsample")(h)
        if sp:
            h = SpatialNorm(g, name="conv_norm_out")(h, zq)
        else:
            h = nn.GroupNorm(num_groups=g, epsilon=1e-6,
                             name="conv_norm_out")(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1,
                       name="conv_out")(nn.silu(h))


class VQModel(nn.Module):
    """encode(x) -> continuous latents (diffusers VQModel.encode
    semantics: quant_conv(encoder(x)), NO codebook lookup — exactly what
    preprocessor.py:250 consumes via ``.latents``); quantize(z) -> the
    nearest-code lookup; decode(z) runs lookup + post_quant_conv +
    spatial-norm decoder (diffusers force_not_quantize=False path)."""
    cfg: VQConfig = VQConfig()

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder(cfg, name="encoder")
        self.decoder = Decoder(cfg, name="decoder")
        self.quant_conv = nn.Conv(cfg.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(cfg.latent_channels, (1, 1),
                                       name="post_quant_conv")
        # centered [-1/n, 1/n) like diffusers' VectorQuantizer
        # (nn.Embedding.uniform_(-1/n, 1/n)); converted checkpoints
        # overwrite this — it only matters for the warned random-init
        # fallback (ADVICE r4)
        n = cfg.num_vq_embeddings

        def _centered_uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype,
                                      minval=-1.0 / n, maxval=1.0 / n)

        self.codebook = self.param(
            "codebook", _centered_uniform,
            (cfg.num_vq_embeddings, cfg.latent_channels))

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def quantize(self, z):
        """[B,H,W,C] -> (quantized z, code indices). Nearest code by
        L2; straight-through is the caller's concern (inference here)."""
        flat = z.reshape(-1, z.shape[-1])
        d = (jnp.sum(flat ** 2, -1, keepdims=True)
             - 2.0 * flat @ self.codebook.T
             + jnp.sum(self.codebook ** 2, -1)[None])
        idx = jnp.argmin(d, axis=-1)
        zq = self.codebook[idx].reshape(z.shape)
        return zq, idx.reshape(z.shape[:-1])

    def decode(self, z):
        zq, _ = self.quantize(z)
        return self.decoder(self.post_quant_conv(zq), zq)

    def __call__(self, x):
        z = self.encode(x)
        return self.decode(z)
