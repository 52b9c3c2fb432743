"""Hiera hierarchical ViT image encoder + FPN neck, in flax.

Parity target: auto-seg/sam2/modeling/backbones/hieradet.py:167 (Hiera) and
the FPN neck in auto-seg/sam2/modeling/backbone_utils. Hiera-L config:
embed 144, heads 2, stages [2, 6, 36, 4], global attention at blocks
23/33/43, window sizes [8, 4, 14, 7] (sam2_configs/sam2_hiera_l.yaml:10-16).

Structure: patch embed (7x7 stride 4), per-stage windowed attention blocks
with q-pooling at stage transitions (2x spatial downsample, channel
doubling), a handful of global-attention blocks, then an FPN neck fusing
the multi-scale outputs to a common 256-d feature pyramid.

TPU notes: window partition is a reshape (no data movement under XLA);
attention is fused einsum; everything jits into one program per image
batch.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 144
    num_heads: int = 2
    stages: Sequence[int] = (2, 6, 36, 4)
    global_att_blocks: Sequence[int] = (23, 33, 43)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    patch_size: int = 7
    patch_stride: int = 4
    mlp_ratio: float = 4.0
    neck_dim: int = 256


def window_partition(x, ws):
    """[B,H,W,C] -> [B*nW, ws, ws, C] with pad to multiples."""
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def window_unpartition(x, ws, padded_hw, hw):
    Hp, Wp = padded_hw
    H, W = hw
    B = x.shape[0] // ((Hp // ws) * (Wp // ws))
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    q_pool: bool = False

    @nn.compact
    def __call__(self, x):
        """[B,H,W,C] -> [B,H',W',dim_out] (H'=H/2 when q_pool)."""
        B, H, W, _ = x.shape
        qkv = nn.Dense(3 * self.dim_out, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, -1)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            # q-pooling: 2x2 max over the query grid (hieradet do_pool)
            q = q.reshape(B, H, W, self.num_heads, -1)
            q = nn.max_pool(q.reshape(B, H, W, -1), (2, 2), (2, 2))
            Hq, Wq = q.shape[1], q.shape[2]
            q = q.reshape(B, Hq * Wq, self.num_heads, -1)
        else:
            Hq, Wq = H, W
        hd = q.shape[-1]
        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum('bhqk,bkhd->bqhd', p, v,
                       preferred_element_type=jnp.float32)
        o = o.reshape(B, Hq, Wq, self.dim_out)
        return nn.Dense(self.dim_out, name="proj")(o)


class HieraBlock(nn.Module):
    dim_out: int
    num_heads: int
    window_size: int      # 0 = global attention
    q_pool: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.q_pool:
            shortcut = nn.max_pool(
                nn.Dense(self.dim_out, name="proj")(x), (2, 2), (2, 2))
        if self.window_size > 0 and not self.q_pool:
            w, padded = window_partition(x, self.window_size)
            w = MultiScaleAttention(self.dim_out, self.num_heads,
                                    name="attn")(w)
            x = window_unpartition(w, self.window_size, padded, (H, W))
        else:
            x = MultiScaleAttention(self.dim_out, self.num_heads,
                                    q_pool=self.q_pool, name="attn")(x)
        x = shortcut + x
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim_out * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim_out, name="mlp_fc2")(h)
        return x + h


class Hiera(nn.Module):
    cfg: HieraConfig = HieraConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """[B,3,H,W] -> list of 4 feature maps [B,H/4/2^s,W/4/2^s,C*2^s]."""
        cfg = self.cfg
        x = images.transpose(0, 2, 3, 1)
        p = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(cfg.patch_stride,) * 2,
                    padding=[(p // 2, p // 2)] * 2, name="patch_embed")(x)
        # absolute positional embedding, interpolated to the grid
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 14, 14, cfg.embed_dim))
        pos = jax.image.resize(pos, (1, x.shape[1], x.shape[2],
                                     cfg.embed_dim), method='bilinear')
        x = x + pos

        outs = []
        block_idx = 0
        dim = cfg.embed_dim
        heads = cfg.num_heads
        for si, depth in enumerate(cfg.stages):
            ws = cfg.window_spec[si]
            for bi in range(depth):
                q_pool = (si > 0 and bi == 0)
                if q_pool:
                    dim *= 2
                    heads *= 2
                gw = 0 if block_idx in cfg.global_att_blocks else ws
                x = HieraBlock(dim, heads, gw, q_pool=q_pool,
                               mlp_ratio=cfg.mlp_ratio,
                               name=f"block_{block_idx}")(x)
                block_idx += 1
            outs.append(x)
        return outs


class FpnNeck(nn.Module):
    """Top-down FPN fusing Hiera stages to ``dim`` channels at each scale
    (sam2 modeling/backbone_utils FpnNeck)."""
    dim: int = 256

    @nn.compact
    def __call__(self, feats):
        lat = [nn.Conv(self.dim, (1, 1), name=f"lateral_{i}")(f)
               for i, f in enumerate(feats)]
        out = [None] * len(lat)
        prev = None
        for i in reversed(range(len(lat))):
            x = lat[i]
            if prev is not None:
                B, H, W, C = x.shape
                prev_up = jax.image.resize(prev, (B, H, W, C),
                                           method='nearest')
                x = x + prev_up
            prev = x
            out[i] = x
        return out


def sine_pos_embed(h: int, w: int, dim: int, temperature: float = 10000.0):
    """2D sine/cosine position encoding [h, w, dim] (sam2
    position_encoding.PositionEmbeddingSine)."""
    d4 = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(d4) / d4))
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * omega[None]
    xs = jnp.arange(w, dtype=jnp.float32)[:, None] * omega[None]
    ye = jnp.concatenate([jnp.sin(ys), jnp.cos(ys)], -1)   # [h, dim/2]
    xe = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], -1)   # [w, dim/2]
    ye = jnp.broadcast_to(ye[:, None, :], (h, w, dim // 2))
    xe = jnp.broadcast_to(xe[None, :, :], (h, w, dim // 2))
    return jnp.concatenate([ye, xe], -1)


class ImageEncoder(nn.Module):
    """Hiera + FPN -> dict of multiscale features + positional encodings
    (the sam2 image_encoder contract: high-res feats for the decoder skip
    connections, lowest-res for memory attention)."""
    cfg: HieraConfig = HieraConfig()

    @nn.compact
    def __call__(self, images):
        feats = Hiera(self.cfg, name="trunk")(images)
        fpn = FpnNeck(self.cfg.neck_dim, name="neck")(feats)
        # the decoder/memory operate on the stride-16 level; /4 and /8 are
        # high-res skip features (sam2 image_encoder contract)
        main = fpn[2]
        return {
            "backbone_fpn": fpn,
            "vision_feats": main,               # stride-16 [B,h,w,256]
            "vision_pos": sine_pos_embed(main.shape[1], main.shape[2],
                                         self.cfg.neck_dim),
            "high_res_feats": fpn[:2],
        }
