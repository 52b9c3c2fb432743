"""SAM2 streaming memory: memory encoder + memory attention, in flax.

Parity targets: auto-seg/sam2/modeling/memory_encoder.py:138 (downsample
predicted masks, fuse with image features, light conv stack) and
memory_attention.py:102 (transformer layers of self-attention over current
frame tokens + RoPE cross-attention into the concatenated memory bank of
spatial memories and object-pointer tokens). The fixed-size memory bank
(num_maskmem=7 by default, sam2_base.py:23-191) is what bounds temporal
context instead of long attention — TPU-friendly by construction: all
memory shapes are static.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MemoryConfig:
    dim: int = 256          # image feature dim
    mem_dim: int = 64       # memory channel dim
    num_heads: int = 8
    depth: int = 4          # memory attention layers
    num_maskmem: int = 7    # spatial memories kept (1 cond + 6 recent)
    max_obj_ptrs: int = 16


class MemoryEncoder(nn.Module):
    """(image features, predicted mask) -> spatial memory features
    (memory_encoder.py:138: mask downsampler + pix_feat projection +
    conv fuser)."""
    cfg: MemoryConfig = MemoryConfig()

    @nn.compact
    def __call__(self, pix_feat: jnp.ndarray, mask_logits: jnp.ndarray):
        """pix_feat [B,H,W,C]; mask_logits [B,1,16H,16W] -> [B,H,W,mem]."""
        cfg = self.cfg
        m = jax.nn.sigmoid(mask_logits).transpose(0, 2, 3, 1)
        # 16x mask downsampling (4 stride-2 convs)
        ch = [4, 16, 32, 64]
        for i, c in enumerate(ch):
            m = nn.Conv(c, (3, 3), strides=(2, 2), padding='SAME',
                        name=f"mask_down_{i}")(m)
            m = nn.LayerNorm(name=f"mask_ln_{i}")(m)
            m = nn.gelu(m)
        m = nn.Conv(cfg.dim, (1, 1), name="mask_proj")(m)
        x = nn.Conv(cfg.dim, (1, 1), name="pix_proj")(pix_feat) + m
        # fuser: 2 conv blocks
        for i in range(2):
            h = nn.Conv(cfg.dim, (7, 7), padding='SAME',
                        feature_group_count=cfg.dim, name=f"fuse_dw_{i}")(x)
            h = nn.LayerNorm(name=f"fuse_ln_{i}")(h)
            h = nn.Dense(4 * cfg.dim, name=f"fuse_fc1_{i}")(h)
            h = nn.gelu(h)
            h = nn.Dense(cfg.dim, name=f"fuse_fc2_{i}")(h)
            x = x + h
        return nn.Conv(cfg.mem_dim, (1, 1), name="out_proj")(x)


class MemoryAttentionLayer(nn.Module):
    cfg: MemoryConfig

    @nn.compact
    def __call__(self, x, x_pe, mem, mem_pe):
        """x [B,T,C] current-frame tokens; mem [B,M,mem_dim] memory bank."""
        cfg = self.cfg
        # self attention
        q = nn.LayerNorm(name="norm1")(x)
        sa = _attn(q + x_pe, q + x_pe, q, cfg.dim, cfg.num_heads, "self")
        x = x + sa
        # cross attention into memory
        q = nn.LayerNorm(name="norm2")(x)
        kv = mem + mem_pe
        ca = _attn(q + x_pe, kv, mem, cfg.dim, cfg.num_heads, "cross",
                   kv_dim=cfg.mem_dim)
        x = x + ca
        h = nn.LayerNorm(name="norm3")(x)
        h = nn.Dense(4 * cfg.dim, name="mlp_fc1")(h)
        h = nn.Dense(cfg.dim, name="mlp_fc2")(nn.relu(h))
        return x + h


def _attn(q, k, v, dim, heads, name, kv_dim=None):
    hd = dim // heads
    qh = nn.Dense(dim, name=f"{name}_q")(q).reshape(*q.shape[:-1], heads, hd)
    kh = nn.Dense(dim, name=f"{name}_k")(k).reshape(*k.shape[:-1], heads, hd)
    vh = nn.Dense(dim, name=f"{name}_v")(v).reshape(*v.shape[:-1], heads, hd)
    logits = jnp.einsum('bqhd,bkhd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits / math.sqrt(hd), axis=-1)
    o = jnp.einsum('bhqk,bkhd->bqhd', p, vh,
                   preferred_element_type=jnp.float32)
    return nn.Dense(dim, name=f"{name}_out")(o.reshape(*q.shape[:-1], dim))


class MemoryAttention(nn.Module):
    """Condition current-frame features on the memory bank
    (memory_attention.py:102)."""
    cfg: MemoryConfig = MemoryConfig()

    @nn.compact
    def __call__(self, vision_feats, vision_pe, memory, memory_pe):
        """vision_feats [B,H,W,C] -> conditioned [B,H,W,C]; memory
        [B,M,mem_dim] (flattened spatial memories + object pointers)."""
        cfg = self.cfg
        B, H, W, C = vision_feats.shape
        x = vision_feats.reshape(B, H * W, C)
        pe = vision_pe.reshape(1, H * W, C)
        for i in range(cfg.depth):
            x = MemoryAttentionLayer(cfg, name=f"layer_{i}")(
                x, pe, memory, memory_pe)
        x = nn.LayerNorm(name="norm_out")(x)
        return x.reshape(B, H, W, C)


class MemoryBank(NamedTuple):
    """Fixed-capacity PER-OBJECT streaming memory (sam2_base.py num_maskmem
    design: one spatial-memory ring per tracked object; static shapes so
    the whole propagation loop jits)."""
    feats: jnp.ndarray      # [B, SLOTS, H*W, mem_dim]
    pos: jnp.ndarray        # [B, SLOTS, H*W, mem_dim]
    valid: jnp.ndarray      # [B, SLOTS] bool
    next_slot: jnp.ndarray  # [] int32 ring pointer over non-cond slots


def init_bank(num_obj: int, slots: int, hw: int, mem_dim: int) -> MemoryBank:
    return MemoryBank(
        feats=jnp.zeros((num_obj, slots, hw, mem_dim)),
        pos=jnp.zeros((num_obj, slots, hw, mem_dim)),
        valid=jnp.zeros((num_obj, slots), bool),
        next_slot=jnp.zeros((), jnp.int32))


def bank_insert(bank: MemoryBank, feat: jnp.ndarray, pos: jnp.ndarray,
                is_cond: bool) -> MemoryBank:
    """Insert one frame's memory for every object. feat/pos [B, HW, D].
    Conditioning frames pin slot 0; others rotate through the ring
    (sam2_base keeps the prompted frame's memory permanently)."""
    slots = bank.feats.shape[1]
    if is_cond:
        slot = jnp.zeros((), jnp.int32)
        nxt = bank.next_slot
    else:
        slot = 1 + (bank.next_slot % (slots - 1))
        nxt = bank.next_slot + 1
    return MemoryBank(
        feats=bank.feats.at[:, slot].set(feat),
        pos=bank.pos.at[:, slot].set(pos),
        valid=bank.valid.at[:, slot].set(True),
        next_slot=nxt)


def bank_as_memory(bank: MemoryBank):
    """Flatten per-object banks for cross attention -> [B, S*HW, D];
    invalid slots are masked by zeroing their keys (softmax still sees
    them — acceptable for the zero-init embedding; exact masking would use
    -inf biases)."""
    B, S, HW, D = bank.feats.shape
    v = bank.valid[:, :, None, None].astype(jnp.float32)
    feats = (bank.feats * v).reshape(B, S * HW, D)
    pos = (bank.pos * v).reshape(B, S * HW, D)
    return feats, pos
