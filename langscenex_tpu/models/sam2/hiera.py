"""Hiera hierarchical ViT image encoder + FPN neck, in flax.

Parity targets (1:1 weight-mappable via utils/convert.convert_sam2,
validated in tests/test_sam2.py against a torch mirror):
  auto-seg/sam2/modeling/backbones/hieradet.py:23-291   Hiera trunk
  auto-seg/sam2/modeling/backbones/image_encoder.py:14-133  ImageEncoder +
      FpnNeck (reversed conv indexing, top-down only at fpn_top_down_levels,
      scalp discards the lowest-res level)
  auto-seg/sam2/modeling/position_encoding.py:16-112   PositionEmbeddingSine
  auto-seg/sam2_configs/sam2_hiera_l.yaml               Hiera-L: embed 144,
      heads 2, stages [2,6,36,4], global attn @ 23/33/43, window_spec
      [8,4,16,8], pos-embed bkg (7,7), fpn_top_down_levels [2,3], scalp 1

Faithful structural details that matter for weights: the window size LAGS
one stage (the first block of each stage runs with the previous stage's
window), q-pooling blocks window-partition first and max-pool queries
inside each window, and the abs pos embed = bicubic background + tiled
window embedding.

TPU notes: window partition is a reshape (no data movement under XLA);
attention is fused einsum; the trunk jits as one program per image batch.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 144
    num_heads: int = 2
    stages: Sequence[int] = (2, 6, 36, 4)
    global_att_blocks: Sequence[int] = (23, 33, 43)
    window_spec: Sequence[int] = (8, 4, 16, 8)
    pos_embed_bkg_size: Tuple[int, int] = (7, 7)
    patch_size: int = 7
    patch_stride: int = 4
    patch_padding: int = 3
    mlp_ratio: float = 4.0
    q_pool: int = 3                      # number of pooling stage shifts
    neck_dim: int = 256
    fpn_top_down_levels: Sequence[int] = (2, 3)
    scalp: int = 1

    @property
    def stage_ends(self):
        s = self.stages
        return [sum(s[:i]) - 1 for i in range(1, len(s) + 1)]

    @property
    def q_pool_blocks(self):
        return [e + 1 for e in self.stage_ends[:-1]][:self.q_pool]


def window_partition(x, ws):
    """[B,H,W,C] -> ([B*nW, ws, ws, C], padded (Hp,Wp))
    (backbones/utils.py window_partition)."""
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
    """hieradet.py:37-79: fused qkv at dim_out, optional 2x2 max-pool on
    the query grid (stage-shift downsample)."""
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
            q = q.reshape(B, H, W, -1)
            q = nn.max_pool(q, (2, 2), (2, 2))
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


class MultiScaleBlock(nn.Module):
    """hieradet.py:82-164. ``window_size`` here is the pre-pool window (the
    lagged previous-stage size); q-pool blocks attend inside those windows
    and emerge at half resolution with window_size//2."""
    dim_in: int
    dim_out: int
    num_heads: int
    window_size: int      # 0 = global attention
    q_pool: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.dim_in != self.dim_out:
            shortcut = nn.Dense(self.dim_out, name="proj")(x)
            if self.q_pool:
                shortcut = nn.max_pool(shortcut, (2, 2), (2, 2))

        ws = self.window_size
        if ws > 0:
            xw, pad_hw = window_partition(x, ws)
        else:
            xw = x
        xw = MultiScaleAttention(self.dim_out, self.num_heads,
                                 q_pool=self.q_pool, name="attn")(xw)
        if self.q_pool:
            ws = ws // 2
            H, W = shortcut.shape[1:3]
            if ws > 0:
                pad_hw = (-(-H // ws) * ws, -(-W // ws) * ws)
        if self.window_size > 0:
            x = window_unpartition(xw, ws, pad_hw, (H, W))
        else:
            x = xw

        x = shortcut + x
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim_out * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim_out, name="mlp_fc2")(h)
        return x + h


class Hiera(nn.Module):
    """hieradet.py:167-291. Returns per-stage feature maps, channels-last,
    high-res first: [B, H/4, W/4, C], ..., [B, H/32, W/32, 8C]."""
    cfg: HieraConfig = HieraConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        """images [B,3,H,W] -> list of 4 stage outputs."""
        cfg = self.cfg
        p = cfg.patch_size
        x = images.transpose(0, 2, 3, 1)
        x = nn.Conv(cfg.embed_dim, (p, p),
                    strides=(cfg.patch_stride,) * 2,
                    padding=[(cfg.patch_padding,) * 2] * 2,
                    name="patch_embed_proj")(x)

        # windowed abs pos embed (hieradet.py:216-273): bicubic background
        # + tiled window embedding. Stored channels-last.
        bh, bw = cfg.pos_embed_bkg_size
        w0 = cfg.window_spec[0]
        pos_bkg = self.param("pos_embed", nn.initializers.zeros,
                             (1, bh, bw, cfg.embed_dim))
        pos_win = self.param("pos_embed_window", nn.initializers.zeros,
                             (1, w0, w0, cfg.embed_dim))
        H, W = x.shape[1], x.shape[2]
        from ...ops.interp import resize_bicubic_torch
        pos = resize_bicubic_torch(pos_bkg, (H, W))
        pos = pos + jnp.tile(pos_win, (1, H // w0, W // w0, 1))
        x = x + pos

        stage_ends = cfg.stage_ends
        q_pool_blocks = cfg.q_pool_blocks
        depth = sum(cfg.stages)
        outs = []
        dim = cfg.embed_dim
        heads = cfg.num_heads
        cur_stage = 1
        for i in range(depth):
            dim_out = dim
            # window size lags one stage (hieradet.py:232-245)
            ws = cfg.window_spec[cur_stage - 1]
            if i in cfg.global_att_blocks:
                ws = 0
            if i - 1 in stage_ends:
                dim_out = dim * 2
                heads = heads * 2
                cur_stage += 1
            x = MultiScaleBlock(dim, dim_out, heads, ws,
                                q_pool=(i in q_pool_blocks),
                                mlp_ratio=cfg.mlp_ratio,
                                name=f"blocks_{i}")(x)
            dim = dim_out
            if i in stage_ends:
                outs.append(x)
        return outs


def sine_pos_embed(h: int, w: int, dim: int, temperature: float = 10000.0):
    """PositionEmbeddingSine (position_encoding.py:16-112, normalize=True,
    scale=2*pi): [h, w, dim] channels-last, channels = [y(dim/2), x(dim/2)]
    with interleaved (sin, cos) pairs at shared frequencies."""
    npf = dim // 2
    eps = 1e-6
    scale = 2.0 * math.pi
    y = (jnp.arange(1, h + 1, dtype=jnp.float32) / (h + eps)) * scale
    x = (jnp.arange(1, w + 1, dtype=jnp.float32) / (w + eps)) * scale
    i = jnp.arange(npf, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(i / 2.0) / npf)

    def enc(v):                              # [n] -> [n, npf]
        a = v[:, None] / dim_t
        even = jnp.sin(a[:, 0::2])
        odd = jnp.cos(a[:, 1::2])
        return jnp.stack([even, odd], axis=-1).reshape(v.shape[0], npf)

    ye = jnp.broadcast_to(enc(y)[:, None, :], (h, w, npf))
    xe = jnp.broadcast_to(enc(x)[None, :, :], (h, w, npf))
    return jnp.concatenate([ye, xe], axis=-1)


class FpnNeck(nn.Module):
    """image_encoder.py:45-133: per-level 1x1 convs indexed in REVERSED
    order (convs_0 takes the lowest-res trunk output), top-down nearest
    upsampling only at ``top_down_levels``, sine pos encodings per level."""
    d_model: int = 256
    top_down_levels: Sequence[int] = (2, 3)

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]):
        n = len(xs) - 1
        out = [None] * len(xs)
        pos = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(self.d_model, (1, 1),
                              name=f"convs_{n - i}")(xs[i])
            if i in self.top_down_levels and prev is not None:
                B, H, W, C = lateral.shape
                up = jax.image.resize(prev, (B, H, W, C), method="nearest")
                prev = lateral + up
            else:
                prev = lateral
            out[i] = prev
            pos[i] = sine_pos_embed(prev.shape[1], prev.shape[2],
                                    self.d_model)
        return out, pos


class ImageEncoder(nn.Module):
    """Hiera trunk + FPN neck (image_encoder.py:14-42). scalp=1 discards
    the stride-32 level; the remaining levels are [stride4, stride8,
    stride16] with vision_features = the stride-16 map."""
    cfg: HieraConfig = HieraConfig()

    @nn.compact
    def __call__(self, images):
        feats = Hiera(self.cfg, name="trunk")(images)
        fpn, pos = FpnNeck(self.cfg.neck_dim,
                           tuple(self.cfg.fpn_top_down_levels),
                           name="neck")(feats)
        if self.cfg.scalp > 0:
            fpn = fpn[:-self.cfg.scalp]
            pos = pos[:-self.cfg.scalp]
        return {
            "backbone_fpn": fpn,
            "vision_pos_enc": pos,
            "vision_features": fpn[-1],
        }
