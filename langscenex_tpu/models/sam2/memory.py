"""SAM2 streaming memory: memory attention + memory encoder, in flax.

Parity targets (1:1 weight-mappable via utils/convert.convert_sam2):
  auto-seg/sam2/modeling/sam/transformer.py:289-360      RoPEAttention
      (axial complex rotary enc over the (x, y) token grid; cross-attention
      repeats the query freqs over the memory slots and excludes the
      trailing object-pointer tokens from rotation)
  auto-seg/sam2/modeling/position_encoding.py:167-221    compute_axial_cis
  auto-seg/sam2/modeling/memory_attention.py:17-169      MemoryAttention
      (4 pre-LN layers: RoPE self-attn, RoPE cross-attn into memory
      [kv_in_dim=64], relu FFN 2048; +0.1*pos at input; final LN)
  auto-seg/sam2/modeling/memory_encoder.py:17-181        MemoryEncoder
      (4x stride-2 mask downsampler convs, pix-feat 1x1 proj, 2 ConvNeXt
      fuser blocks, 1x1 out proj 256->64)

The fixed-size memory bank (num_maskmem=7, sam2_base.py:128) bounds
temporal context instead of long attention — all shapes static after the
bank warms up, so the conditioning step compiles once per bank size.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MemoryConfig:
    dim: int = 256          # image feature dim (d_model)
    mem_dim: int = 64       # memory channel dim (kv_in_dim of cross attn)
    num_heads: int = 1      # RoPEAttention heads (sam2_hiera_l.yaml)
    depth: int = 4          # memory attention layers
    ffn_dim: int = 2048
    rope_theta: float = 10000.0
    num_maskmem: int = 7    # spatial memories kept (1 cond + 6 recent)
    max_obj_ptrs: int = 16


def axial_rope_cos_sin(dim: int, end_x: int, end_y: int, theta: float):
    """compute_axial_cis (position_encoding.py:174-183) as (cos, sin)
    [end_x*end_y, dim/2]: first dim/4 pairs rotate with x = idx % end_x,
    the rest with y = idx // end_x."""
    quarter = dim // 4
    freqs = 1.0 / (theta ** (jnp.arange(0, dim, 4,
                                        dtype=jnp.float32)[:quarter] / dim))
    t = jnp.arange(end_x * end_y, dtype=jnp.float32)
    tx = t % end_x
    ty = jnp.floor(t / end_x)
    ang = jnp.concatenate([tx[:, None] * freqs, ty[:, None] * freqs],
                          axis=-1)                     # [N, dim/2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x [..., N, hd]; (even, odd) channel pairs as (real, imag)
    (position_encoding.py:194-221 view_as_complex convention)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    xr = x1 * cos - x2 * sin
    xi = x1 * sin + x2 * cos
    return jnp.stack([xr, xi], axis=-1).reshape(x.shape)


class RoPEAttention(nn.Module):
    """sam/transformer.py:289-360. q tokens form an (end_x, end_y) grid;
    with rope_k_repeat the grid freqs are tiled across the memory slots.
    The last ``num_k_exclude_rope`` k tokens (object pointers) stay
    unrotated."""
    dim: int
    num_heads: int
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0):
        d = self.dim
        H = self.num_heads
        hd = d // H
        qh = nn.Dense(d, name="q_proj")(q).reshape(*q.shape[:-1], H, hd)
        kh = nn.Dense(d, name="k_proj")(k).reshape(*k.shape[:-1], H, hd)
        vh = nn.Dense(d, name="v_proj")(v).reshape(*v.shape[:-1], H, hd)
        qh = qh.swapaxes(-2, -3)                       # [B,H,N,hd]
        kh = kh.swapaxes(-2, -3)
        vh = vh.swapaxes(-2, -3)

        n_q = qh.shape[-2]
        side = int(round(math.sqrt(n_q)))
        cos, sin = axial_rope_cos_sin(hd, side, side, self.rope_theta)
        qh = apply_rotary(qh, cos, sin)
        n_rot = kh.shape[-2] - num_k_exclude_rope
        if self.rope_k_repeat and n_rot != n_q:
            r = n_rot // n_q
            cos = jnp.tile(cos, (r, 1))
            sin = jnp.tile(sin, (r, 1))
        if num_k_exclude_rope > 0:
            k_rot = apply_rotary(kh[..., :n_rot, :], cos, sin)
            kh = jnp.concatenate([k_rot, kh[..., n_rot:, :]], axis=-2)
        else:
            kh = apply_rotary(kh, cos, sin)

        logits = jnp.einsum('...qd,...kd->...qk', qh, kh,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits / math.sqrt(hd), axis=-1)
        o = jnp.einsum('...qk,...kd->...qd', p, vh,
                       preferred_element_type=jnp.float32)
        o = o.swapaxes(-2, -3).reshape(*q.shape[:-1], d)
        return nn.Dense(self.dim, name="out_proj")(o)


class MemoryAttentionLayer(nn.Module):
    """memory_attention.py:17-99 with the sam2_hiera_l.yaml flags:
    pos_enc_at_attn=False (RoPE carries positions in self-attn),
    pos_enc_at_cross_attn_keys=True, queries=False; relu FFN."""
    cfg: MemoryConfig

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos,
                 num_k_exclude_rope: int = 0):
        cfg = self.cfg
        t2 = nn.LayerNorm(name="norm1")(tgt)
        sa = RoPEAttention(cfg.dim, cfg.num_heads, cfg.rope_theta,
                           name="self_attn")
        tgt = tgt + sa(t2, t2, t2)

        t2 = nn.LayerNorm(name="norm2")(tgt)
        ca = RoPEAttention(cfg.dim, cfg.num_heads, cfg.rope_theta,
                           rope_k_repeat=True, name="cross_attn_image")
        tgt = tgt + ca(t2, memory + pos, memory,
                       num_k_exclude_rope=num_k_exclude_rope)

        t2 = nn.LayerNorm(name="norm3")(tgt)
        h = nn.Dense(cfg.ffn_dim, name="linear1")(t2)
        h = nn.Dense(cfg.dim, name="linear2")(nn.relu(h))
        return tgt + h


class MemoryAttention(nn.Module):
    """memory_attention.py:102-169: +0.1*curr_pos at input, N layers,
    final LayerNorm."""
    cfg: MemoryConfig = MemoryConfig()

    @nn.compact
    def __call__(self, curr, memory, curr_pos, memory_pos,
                 num_obj_ptr_tokens: int = 0):
        """curr [B,T,C] current-frame tokens; memory [B,M,mem_dim]
        (spatial memories + trailing object-pointer tokens)."""
        x = curr + 0.1 * curr_pos
        for i in range(self.cfg.depth):
            x = MemoryAttentionLayer(self.cfg, name=f"layers_{i}")(
                x, memory, memory_pos, curr_pos,
                num_k_exclude_rope=num_obj_ptr_tokens)
        return nn.LayerNorm(name="norm")(x)


class MaskDownSampler(nn.Module):
    """memory_encoder.py:17-58 with the hiera_l config (k3 s2 p1, 4 layers
    1->4->16->64->256 + LN2d + GELU, final 1x1 to embed_dim). Sequential
    indices in the torch state_dict: convs at 0,3,6,9,12; LNs at 1,4,7,10."""
    embed_dim: int = 256

    @nn.compact
    def __call__(self, m):
        """m [B,1,16H,16W] (already sigmoided+scaled) -> [B,H,W,embed]."""
        x = m.transpose(0, 2, 3, 1)
        ch = 1
        for i in range(4):
            ch = ch * 4
            x = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)],
                        name=f"encoder_{3 * i}")(x)
            x = nn.LayerNorm(epsilon=1e-6, name=f"encoder_{3 * i + 1}")(x)
            x = nn.gelu(x, approximate=False)
        return nn.Conv(self.embed_dim, (1, 1), name="encoder_12")(x)


class CXBlock(nn.Module):
    """ConvNeXt block (memory_encoder.py:62-117): 7x7 depthwise conv,
    LN (eps 1e-6), 1x1 expand 4x, GELU, 1x1 project, layer scale."""
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,))
        return x + gamma * h


class MemoryEncoder(nn.Module):
    """memory_encoder.py:138-181: fuse pixel features with the downsampled
    mask, 2 CXBlocks, project 256->64."""
    cfg: MemoryConfig = MemoryConfig()

    @nn.compact
    def __call__(self, pix_feat: jnp.ndarray, mask_for_mem: jnp.ndarray):
        """pix_feat [B,H,W,C]; mask_for_mem [B,1,16H,16W] (sigmoid already
        applied + scale/bias, sam2_base.py:684-698) -> [B,H,W,mem_dim]."""
        cfg = self.cfg
        m = MaskDownSampler(cfg.dim, name="mask_downsampler")(mask_for_mem)
        x = nn.Conv(cfg.dim, (1, 1), name="pix_feat_proj")(pix_feat)
        x = x + m
        for i in range(2):
            x = CXBlock(cfg.dim, name=f"fuser_layers_{i}")(x)
        return nn.Conv(cfg.mem_dim, (1, 1), name="out_proj")(x)
