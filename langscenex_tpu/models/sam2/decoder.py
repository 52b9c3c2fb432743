"""SAM prompt encoder + two-way-transformer mask decoder, in flax.

Parity targets: auto-seg/sam2/modeling/sam/prompt_encoder.py:17 (random
spatial frequency point/box embeddings + mask downscaling conv) and
mask_decoder.py:15 (iou token + mask tokens, two-way cross attention,
hypernetwork MLPs over upscaled features, multimask output). Applies to
both the SAM2 heads and the SAM1 decoder used by the automatic mask
generator (the architectures coincide at this granularity).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    depth: int = 2
    num_multimask: int = 3     # + 1 single-mask token


class RandomPositionEncoding(nn.Module):
    """Gaussian random-frequency coordinate encoding
    (prompt_encoder PositionEmbeddingRandom)."""
    dim: int = 256

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords in [0,1]^2, [...,2] -> [..., dim]."""
        gauss = self.param("gauss", nn.initializers.normal(1.0),
                           (2, self.dim // 2))
        x = (2.0 * coords - 1.0) @ jax.lax.stop_gradient(gauss) * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


class PromptEncoder(nn.Module):
    """Points (+labels), boxes, masks -> sparse/dense embeddings."""
    cfg: DecoderConfig = DecoderConfig()

    def setup(self):
        self.pe = RandomPositionEncoding(self.cfg.dim)
        # labels: 0 neg, 1 pos, 2/3 box corners, -1 pad
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(1.0), (4, self.cfg.dim))
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0), (1, self.cfg.dim))
        self.no_mask_embed = self.param(
            "no_mask", nn.initializers.normal(1.0), (1, self.cfg.dim))
        self.mask_down = nn.Sequential([
            nn.Conv(self.cfg.dim // 16, (2, 2), strides=(2, 2)), nn.gelu,
            nn.Conv(self.cfg.dim // 4, (2, 2), strides=(2, 2)), nn.gelu,
            nn.Conv(self.cfg.dim, (1, 1))])

    def encode_points(self, coords: jnp.ndarray, labels: jnp.ndarray):
        """coords [B,N,2] normalized to [0,1]; labels [B,N] int."""
        emb = self.pe(coords)
        lab = jnp.clip(labels, 0, 3)
        emb = emb + jnp.where(labels[..., None] >= 0,
                              self.point_embed[lab], self.not_a_point)
        return emb

    def encode_mask(self, mask: Optional[jnp.ndarray], hw: Tuple[int, int]):
        """mask [B,1,4H,4W] logits or None -> dense [B,H,W,dim]."""
        if mask is None:
            return jnp.broadcast_to(self.no_mask_embed.reshape(1, 1, 1, -1),
                                    (1, hw[0], hw[1], self.cfg.dim))
        x = mask.transpose(0, 2, 3, 1)
        return self.mask_down(x)

    def __call__(self, coords, labels, mask, hw):
        return self.encode_points(coords, labels), self.encode_mask(mask, hw)


class CrossAttention(nn.Module):
    dim: int
    num_heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        H = self.num_heads
        hd = d // H
        qh = nn.Dense(d, name="q")(q).reshape(*q.shape[:-1], H, hd)
        kh = nn.Dense(d, name="k")(k).reshape(*k.shape[:-1], H, hd)
        vh = nn.Dense(d, name="v")(v).reshape(*v.shape[:-1], H, hd)
        logits = jnp.einsum('bqhd,bkhd->bhqk', qh, kh,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits / math.sqrt(hd), axis=-1)
        o = jnp.einsum('bhqk,bkhd->bqhd', p, vh,
                       preferred_element_type=jnp.float32)
        o = o.reshape(*q.shape[:-1], d)
        return nn.Dense(self.dim, name="out")(o)


class TwoWayBlock(nn.Module):
    cfg: DecoderConfig
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, qpe, kpe):
        cfg = self.cfg
        q = queries if self.skip_first_pe else queries + qpe
        att = CrossAttention(cfg.dim, cfg.num_heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries + att)
        att = CrossAttention(cfg.dim, cfg.num_heads, 2, name="t2i")(
            queries + qpe, keys + kpe, keys)
        queries = nn.LayerNorm(name="norm2")(queries + att)
        h = nn.Dense(cfg.mlp_dim, name="mlp_fc1")(queries)
        h = nn.Dense(cfg.dim, name="mlp_fc2")(nn.relu(h))
        queries = nn.LayerNorm(name="norm3")(queries + h)
        att = CrossAttention(cfg.dim, cfg.num_heads, 2, name="i2t")(
            keys + kpe, queries + qpe, queries)
        keys = nn.LayerNorm(name="norm4")(keys + att)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: DecoderConfig = DecoderConfig()

    @nn.compact
    def __call__(self, img_feat, img_pe, sparse_emb, dense_emb,
                 multimask: bool = True):
        """img_feat [B,H,W,C], img_pe [H,W,C], sparse_emb [B,N,C],
        dense_emb [B,H,W,C] -> (masks [B,M,4H,4W], iou [B,M],
        mask_tokens_out [B,M,C])."""
        cfg = self.cfg
        B, H, W, C = img_feat.shape
        n_mask_tokens = cfg.num_multimask + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, C))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_mask_tokens, C))
        tokens = jnp.concatenate([iou_token, mask_tokens], 0)
        tokens = jnp.broadcast_to(tokens[None], (B,) + tokens.shape)
        tokens = jnp.concatenate([tokens, sparse_emb], axis=1)

        src = (img_feat + dense_emb).reshape(B, H * W, C)
        pe = jnp.broadcast_to(img_pe.reshape(1, H * W, C), (B, H * W, C))
        qpe = jnp.zeros_like(tokens)

        q, k = tokens, src
        for i in range(cfg.depth):
            q, k = TwoWayBlock(cfg, skip_first_pe=(i == 0),
                               name=f"block_{i}")(q, k, tokens, pe)
        att = CrossAttention(cfg.dim, cfg.num_heads, 2, name="final_t2i")(
            q + tokens, k + pe, k)
        q = nn.LayerNorm(name="final_norm")(q + att)

        iou_out = q[:, 0]
        mtok = q[:, 1:1 + n_mask_tokens]

        # upscale image features 4x (two transposed convs)
        up = k.reshape(B, H, W, C)
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2), name="up1")(up)
        up = nn.gelu(nn.LayerNorm(name="up_norm")(up))
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2), name="up2")(up)
        up = nn.gelu(up)                                  # [B,4H,4W,C/8]

        # hypernetwork MLPs: one 3-layer MLP per mask token
        hyper = []
        for i in range(n_mask_tokens):
            h = mtok[:, i]
            for j, d in enumerate([C, C, C // 8]):
                h = nn.Dense(d, name=f"hyper_{i}_{j}")(h)
                if j < 2:
                    h = nn.relu(h)
            hyper.append(h)
        hyper = jnp.stack(hyper, 1)                       # [B,M,C/8]
        masks = jnp.einsum('bmc,bhwc->bmhw', hyper, up,
                           preferred_element_type=jnp.float32)

        iou_pred = iou_out
        for j, d in enumerate([C, C, n_mask_tokens]):
            iou_pred = nn.Dense(d, name=f"iou_mlp_{j}")(iou_pred)
            if j < 2:
                iou_pred = nn.relu(iou_pred)

        if multimask:
            return masks[:, 1:], iou_pred[:, 1:], mtok[:, 1:]
        return masks[:, :1], iou_pred[:, :1], mtok[:, :1]
